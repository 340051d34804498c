"""Device mesh + sharding helpers.

One abstraction covers 1 chip → multi-host pods: a 2-D
``jax.sharding.Mesh`` with axes ``('data', 'model')``. Batches are sharded
over ``data``; embedding tables may be row-sharded over ``model``
(the TPU-native replacement for the reference's Accelerate/NCCL DDP,
SURVEY.md §2.8). XLA inserts the psum/all-gather/all-to-all collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_model

    def batch_sharding(self, ndim: int = 1) -> NamedSharding:
        spec = P("data", *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def row_sharded(self) -> NamedSharding:
        """Row-shard a [vocab, dim] table over the 'model' axis."""
        return NamedSharding(self.mesh, P("model", None))

    # ------------------------------------------------------------------
    def shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """Device-put a host batch, splitting the leading axis over 'data'.

        Rows are padded to a multiple of the data-axis size with zero-weight
        copies so shapes stay static.
        """
        out = {}
        d = self.n_data
        for k, v in batch.items():
            v = np.asarray(v)
            if v.ndim == 0:  # scalars (e.g. eval reparam seed): replicate
                out[k] = jax.device_put(v, self.replicated())
                continue
            if v.ndim >= 1 and v.shape[0] % d != 0:
                pad = d - (v.shape[0] % d)
                filler = np.repeat(v[-1:], pad, axis=0)
                if k == "weight":
                    filler = np.zeros_like(filler)
                v = np.concatenate([v, filler], axis=0)
            out[k] = jax.device_put(v, self.batch_sharding(v.ndim))
        return out

    def replicate(self, tree):
        sh = self.replicated()
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    # ------------------------------------------------------------------
    def param_shardings(self, params, min_rows: int = 1024,
                        shard_embeddings: bool = True):
        """Sharding tree for a param pytree: embedding tables with enough
        rows are row-sharded over 'model' (the EP-shaped strategy from
        SURVEY.md §2.9 — the reference replicates all tables,
        reco_abc.py:167-170); everything else is replicated. XLA/GSPMD
        inserts the ID all-to-all + gather collectives from these
        annotations."""
        repl = self.replicated()
        row = self.row_sharded()
        n_model = self.n_model

        def rule(path, x):
            if not shard_embeddings or n_model <= 1:
                return repl
            names = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                             for p in path).lower()
            if (getattr(x, "ndim", 0) == 2 and "embedding" in names
                    and x.shape[0] >= min_rows and x.shape[0] % n_model == 0):
                return row
            return repl

        return jax.tree_util.tree_map_with_path(rule, params)

    def shard_params(self, params, min_rows: int = 1024,
                     shard_embeddings: bool = True):
        sh = self.param_shardings(params, min_rows, shard_embeddings)
        return jax.tree_util.tree_map(jax.device_put, params, sh)


def create_mesh(config: Optional[Dict[str, Any]] = None,
                devices: Optional[Sequence[jax.Device]] = None,
                data: int = -1, model: int = 1) -> MeshContext:
    """Build the ('data','model') mesh. data=-1 → all remaining devices."""
    if config is not None:
        data = int(config.get("mesh_data", data))
        model = int(config.get("mesh_model", model))
    devs = list(devices if devices is not None else jax.devices())
    model = max(model, 1)
    if data <= 0:
        data = max(len(devs) // model, 1)
    n = data * model
    if n > len(devs):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(data, model)
    return MeshContext(Mesh(arr, ("data", "model")))
