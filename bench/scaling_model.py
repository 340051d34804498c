"""Honest multi-chip scaling account (no multi-chip hardware available).

This environment has ONE real TPU chip, so N-chip examples/sec cannot be
measured. Instead of inventing numbers, this script derives the scaling
story from two trustworthy inputs:

  1. the REAL per-step collective traffic, extracted from the compiled
     (post-GSPMD) HLO of the actual sharded train step on a virtual
     8-device mesh — the same program the driver's dryrun executes; and
  2. the MEASURED single-chip step time (bench.py: 107.5 ms at batch 32,768,
     81% HBM utilization — see docs/performance_notes.md).

Weak-scaling model (per-chip batch held constant, the standard rec-sys
deployment): efficiency(N) = t_compute / (t_compute + t_collective(N)),
with t_collective = ring-all-reduce time for the gradient payload over one
ICI torus axis. This is conservative: XLA overlaps gradient all-reduce
with the backward pass, so the true efficiency is at least this.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python bench/scaling_model.py
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Platform/device-count setup happens in __main__ only: this module is also
# imported by tests (for collective_bytes), and mutating jax_platforms at
# import time would silently move the whole pytest run off the conftest's
# 8-device CPU mesh (e.g. onto the 1-chip axon TPU when JAX_PLATFORMS=axon
# is exported in the shell).
if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np

import jax
import jax.numpy as jnp

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# measured on the one real chip (bench.py, docs/performance_notes.md)
MEASURED_MS_PER_STEP = 90.7
MEASURED_BATCH = 32_768

# v5e ICI: 2D torus, ~45 GB/s one-way per link per direction (public
# "How to Scale Your Model" numbers). A bidirectional ring all-reduce over
# one torus axis moves 2*(N-1)/N * payload bytes per chip, split over the
# two ring directions.
ICI_GBS_PER_DIRECTION = 45.0

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

_SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s64|u64|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    """Bytes of every shape literal in ``text`` (handles tuple results)."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        total += n * DTYPE_BYTES[m.group(1)]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum result bytes per collective kind over the compiled HLO."""
    kinds = {"all-reduce": 0, "all-gather": 0, "all-to-all": 0,
             "reduce-scatter": 0, "collective-permute": 0}
    counts = {k: 0 for k in kinds}
    for line in hlo_text.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        for kind in kinds:
            # the result type annotation (scalar or tuple) precedes the op
            # name (e.g. "(f32[50000,64], f32[128]) all-reduce(...)")
            m = re.search(rf"\b{kind}(-start)?\(", rhs)
            if m:
                ann = rhs[: m.start()].strip()
                b = _shape_bytes(ann)
                # async `-start` forms return a tuple that ALIASES the
                # operand alongside the result ("(f32[1024], f32[1024])
                # all-reduce-start"), so the tuple sums the payload twice;
                # count only the result half. Sync tuple results (one
                # all-reduce over several gradient tensors) are all real
                # payload and count fully.
                if m.group(1) and ann.startswith("("):
                    b //= 2
                kinds[kind] += b
                counts[kind] += 1
                break
    return {k: {"bytes": v, "ops": counts[k]} for k, v in kinds.items() if v}


def build_sharded_step(n_data: int, n_model: int, batch: int):
    from unirec_tpu import config as config_mod
    from unirec_tpu.core.mesh import create_mesh
    from unirec_tpu.core.optim import build_optimizer
    from unirec_tpu.data.device_pipeline import DeviceAugmenter
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils.registry import get_model_class

    # bench.py's workload shapes: the collective payload (gradient tables)
    # is what matters and is batch-independent for DP
    n_items, n_users, L, d = 50_000, 100_000, 50, 64
    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": n_users, "n_items": n_items,
        "max_seq_len": L, "embedding_size": d, "hidden_size": d,
        "inner_size": 2 * d, "n_layers": 2, "n_heads": 2, "loss_type": "bce",
        "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0,
        "n_sample_neg_train": 9, "dataloader": "SeqRecDataset",
        "history_mask_mode": "autoregressive", "group_size": -1,
        "compute_dtype": "bfloat16", "last_query_only": 1,
        "shard_embeddings": 1 if n_model > 1 else 0,
    }, argv=[])
    mesh = create_mesh(devices=jax.devices()[: n_data * n_model],
                       data=n_data, model=n_model)
    model = get_model_class("SASRec")(cfg=cfg)
    tx = build_optimizer(cfg)

    rng = np.random.default_rng(0)
    lens = rng.integers(10, 200, size=n_users).astype(np.int32)
    items = np.zeros((n_users, 200), np.int32)
    m = np.arange(200)[None, :] < lens[:, None]
    items[m] = rng.integers(1, n_items, size=int(m.sum()))
    aug = DeviceAugmenter(cfg, UserHistory(items, lens))

    raw = {"user_id": rng.integers(1, n_users, size=batch).astype(np.int32),
           "item_id": rng.integers(1, n_items, size=batch).astype(np.int32),
           "weight": np.ones(batch, np.float32)}

    def train_step(params, opt_state, batch, key):
        key, k_aug = jax.random.split(key)
        full = aug.augment(batch, k_aug)

        def loss_fn(p):
            loss, _ = model.apply({"params": p}, full, train=True,
                                  rngs={"dropout": key})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    init_full = aug.augment(
        aug.with_state({k: jnp.asarray(v) for k, v in raw.items()}),
        jax.random.PRNGKey(0))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, init_full,
                           train=False)
    params = mesh.shard_params(variables["params"],
                               min_rows=n_model if n_model > 1 else 1 << 30)
    opt_state = jax.jit(tx.init)(params)
    batch_sharded = aug.with_state(mesh.shard_batch(raw))
    with mesh.mesh:
        compiled = jax.jit(train_step).lower(
            params, opt_state, batch_sharded, jax.random.PRNGKey(2)).compile()
    return compiled, params


def main():
    batch = int(os.environ.get("SCALING_BATCH", 2048))
    report = {}
    for name, (nd, nm) in {"dp8": (8, 1), "dp4_mp2": (4, 2)}.items():
        compiled, params = build_sharded_step(nd, nm, batch)
        hlo = compiled.as_text()
        coll = collective_bytes(hlo)
        param_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                          for x in jax.tree_util.tree_leaves(params))
        report[name] = {"mesh": f"{nd}x{nm}", "batch": batch,
                        "param_bytes": param_bytes, "collectives": coll}

    # weak-scaling model from the DP numbers: grad all-reduce payload is
    # batch-independent, so scale directly against the measured step time
    ar = report["dp8"]["collectives"].get("all-reduce", {"bytes": 0})["bytes"]
    # per-chip ring all-reduce traffic ~ 2*(N-1)/N * payload; both ring
    # directions usable
    t_compute = MEASURED_MS_PER_STEP / 1000.0
    table = {}
    for n in (2, 4, 8, 16, 32):
        t_coll = 2.0 * (n - 1) / n * ar / (2 * ICI_GBS_PER_DIRECTION * 1e9)
        eff = t_compute / (t_compute + t_coll)
        table[n] = {"t_collective_ms": round(1000 * t_coll, 3),
                    "efficiency": round(eff, 4)}
    report["weak_scaling_model"] = {
        "assumptions": "ring all-reduce over one v5e ICI torus axis, "
                       f"{ICI_GBS_PER_DIRECTION} GB/s per direction, no "
                       "compute/communication overlap (conservative)",
        "measured_t_compute_ms": MEASURED_MS_PER_STEP,
        "grad_allreduce_bytes": ar,
        "per_chips": table,
    }
    # cross-host case (the BASELINE.json 1->4 hosts target): a hierarchical
    # all-reduce is intra-host ICI reduce-scatter + inter-host DCN ring +
    # intra-host ICI all-gather. Assume 200 Gbps (25 GB/s) DCN per host —
    # the conservative public Cloud TPU figure — and charge BOTH phases
    # (the ICI phases are not free even though DCN dominates).
    dcn_gbs = 25.0
    chips_per_host = 8
    t_ici = (2.0 * (chips_per_host - 1) / chips_per_host * ar
             / (2 * ICI_GBS_PER_DIRECTION * 1e9))
    hosts = {}
    for h in (2, 4):
        t_dcn = 2.0 * (h - 1) / h * ar / (dcn_gbs * 1e9)
        eff = t_compute / (t_compute + t_ici + t_dcn)
        hosts[h] = {"t_ici_ms": round(1000 * t_ici, 3),
                    "t_dcn_ms": round(1000 * t_dcn, 3),
                    "efficiency": round(eff, 4)}
    report["weak_scaling_model"]["cross_host_dcn"] = {
        "assumptions": f"{dcn_gbs} GB/s DCN per host, hierarchical "
                       "all-reduce (intra-host ICI reduce-scatter + "
                       f"inter-host DCN ring + intra-host all-gather over "
                       f"{chips_per_host} chips/host), no overlap; "
                       "collective bytes come from a CPU-backend GSPMD "
                       "compile at the SCALING_BATCH size while t_compute "
                       "is the TPU bench measurement at batch 32768 — the "
                       "grad payload is batch-independent so the mix is "
                       "sound, but it is a modeled (not measured) number",
        "per_hosts": hosts,
    }
    json.dump(report, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
