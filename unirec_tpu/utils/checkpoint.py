"""Full-state checkpointing.

Saves {config, cur_epoch, cur_step, best_valid_score, params, constants,
opt_state} — the same dict contract as the reference (trainer.py:389-398) but
with the optimizer state actually restored on resume (the reference saves it
and never loads it back; SURVEY.md §5). Serialized with flax msgpack; config
as JSON-compatible dict (private '_'-prefixed keys holding arrays are saved
as arrays too).
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, state: Dict[str, Any], retries: int = 5):
    if jax.process_count() > 1:
        # replicated state: one writer (reference gates saves on the main
        # process, trainer.py:292-296); a barrier so no process reads or
        # exits before the file is complete
        from jax.experimental import multihost_utils
        if jax.process_index() == 0:
            _write_checkpoint(path, state, retries)
        multihost_utils.sync_global_devices("unirec_ckpt_saved")
        return
    _write_checkpoint(path, state, retries)


def _write_checkpoint(path: str, state: Dict[str, Any], retries: int = 5):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = dict(state)
    for k in ("params", "constants", "opt_state"):
        if k in payload and payload[k] is not None:
            payload[k] = _to_host(payload[k])
    if "config" in payload and payload["config"] is not None:
        cfg = {k: v for k, v in payload["config"].items() if not k.startswith("_")}
        payload["config"] = cfg
    err = None
    for _ in range(retries):  # save retried on IOError (trainer.py:399-412)
        try:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)
            return
        except IOError as e:  # pragma: no cover
            err = e
    raise err  # pragma: no cover


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path) or os.path.isdir(path + ".orbax"):
        return _load_orbax(path if os.path.isdir(path) else path + ".orbax")
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------------- orbax backend
# The pickle backend gathers everything to one host. For row-sharded tables
# (shard_embeddings on a multi-host mesh) use checkpoint_backend='orbax':
# parameters are written as a sharded orbax checkpoint (each host saves its
# own shards); config and optimizer state ride in a pickle sidecar.
def save_checkpoint_orbax(path: str, state: Dict[str, Any]):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not path.endswith(".orbax"):
        path = path + ".orbax"
    multiproc = jax.process_count() > 1
    if multiproc:
        # orbax's sharded save is a COLLECTIVE — every process writes its
        # own table shards — but directory prep and the replicated side
        # state are single-writer
        from jax.experimental import multihost_utils
        if jax.process_index() == 0:
            _prep_ckpt_dir(path)
        multihost_utils.sync_global_devices("unirec_orbax_dir_ready")
    else:
        _prep_ckpt_dir(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), state["params"])
    if multiproc and jax.process_index() != 0:
        return
    side = {k: v for k, v in state.items() if k != "params"}
    for k in ("constants", "opt_state"):
        if side.get(k) is not None:
            side[k] = _to_host(side[k])
    if side.get("config") is not None:
        side["config"] = {k: v for k, v in side["config"].items()
                          if not k.startswith("_")}
    with open(os.path.join(path, "side.pkl"), "wb") as f:
        pickle.dump(side, f, protocol=pickle.HIGHEST_PROTOCOL)


def _prep_ckpt_dir(path: str):
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)


def _load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "side.pkl"), "rb") as f:
        state = pickle.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        state["params"] = ckptr.restore(os.path.join(os.path.abspath(path),
                                                     "params"))
    return state


def load_model_freely(path: str):
    """Re-instantiate a model from the config embedded in its checkpoint
    (reference general.py:208-230). Returns (model, params, constants, config)."""
    from unirec_tpu.utils.registry import get_model_class

    ckpt = load_checkpoint(path)
    cfg = ckpt["config"]
    model = get_model_class(cfg["model"])(cfg=cfg)
    return model, ckpt["params"], ckpt.get("constants"), cfg
