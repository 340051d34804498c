"""Ablation: where do the bench step's time and HBM bytes go?

cost_analysis for the full train step reports ~39.4 MFLOP/example but
~5.8 MB/example of HBM traffic — the step is bandwidth-bound at ~70% of the
v5e's 819 GB/s while doing ~2% MFU.  This script times (and cost-analyses)
the step in pieces to locate the traffic:

  noop            host->device feed + trivial compute (tunnel/dispatch floor)
  aug             device pipeline only (sampling + history windows)
  fwd             aug + forward loss, no grad, train=False (no dropout)
  fwd_do          aug + forward loss, no grad, train=True  (dropout on)
  grad            aug + value_and_grad, no optimizer
  full            the real train step (grad + adam update)

Run: python bench/ablate_step.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def timeit(fn, make_args, steps=8, warmup=2):
    for i in range(warmup):
        out = fn(*make_args(i))
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(*make_args(100 + i))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf)))
    return (time.perf_counter() - t0) / steps


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))


def main():
    step, params, opt_state, raw, aug = bench.build()
    from unirec_tpu.utils.registry import get_model_class
    # rebuild model handle identically to bench.build
    import numpy as np
    from unirec_tpu import config as config_mod
    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": bench.N_USERS, "n_items": bench.N_ITEMS,
        "max_seq_len": bench.SEQ_LEN, "embedding_size": bench.EMB_DIM,
        "hidden_size": bench.EMB_DIM, "inner_size": 2 * bench.EMB_DIM,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce",
        "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
        "learning_rate": 1e-3, "group_size": -1,
        "n_sample_neg_train": bench.N_NEG, "dataloader": "SeqRecDataset",
        "history_mask_mode": "autoregressive",
    }, argv=[])
    model = get_model_class("SASRec")(cfg=cfg)

    it = iter(raw)
    batches = [aug.with_state({k: jnp.asarray(v) for k, v in b.items()})
               for _, b in zip(range(16), it)]
    key = jax.random.PRNGKey(7)

    def feed(i):
        return batches[i % len(batches)]

    # --- noop: touch the raw ids only
    @jax.jit
    def noop(b):
        return jnp.sum(b["user_id"]) + jnp.sum(b["item_id"])

    # --- aug only
    @jax.jit
    def aug_only(b, k):
        full = aug.augment(b, k)
        return sum(jnp.sum(v) for v in full.values()
                   if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.number))

    # --- forward (train=False / train=True)
    def fwd(p, b, k, train):
        full = aug.augment(b, k)
        loss, _ = model.apply({"params": p}, full, train=train,
                              rngs={"dropout": k})
        return loss

    fwd_eval = jax.jit(lambda p, b, k: fwd(p, b, k, False))
    fwd_do = jax.jit(lambda p, b, k: fwd(p, b, k, True))
    grad_only = jax.jit(lambda p, b, k: jax.value_and_grad(
        lambda q: fwd(q, b, k, True))(p))

    rows = []
    for name, fn, mk in [
        ("noop", noop, lambda i: (feed(i),)),
        ("aug", aug_only, lambda i: (feed(i), jax.random.fold_in(key, i))),
        ("fwd", fwd_eval, lambda i: (params, feed(i), jax.random.fold_in(key, i))),
        ("fwd_do", fwd_do, lambda i: (params, feed(i), jax.random.fold_in(key, i))),
        ("grad", grad_only, lambda i: (params, feed(i), jax.random.fold_in(key, i))),
    ]:
        fl, by = cost(fn, *mk(0))
        dt = timeit(fn, mk)
        rows.append({"what": name, "ms": round(1000 * dt, 2),
                     "gflop": round(fl / 1e9, 2), "gbytes": round(by / 1e9, 3),
                     "tflops": round(fl / dt / 1e12, 2),
                     "gbs": round(by / dt / 1e9, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # full step (reuse compiled one from bench.build) — time only
    n = [0]
    def full_args(i):
        n[0] += 1
        return (params, opt_state, feed(i), jax.random.fold_in(key, i))
    # note: step donates params/opt_state; pass fresh copies each call
    import copy as _copy
    p2, o2 = params, opt_state
    for i in range(2):
        p2, o2, loss = step(p2, o2, feed(i), jax.random.fold_in(key, i))
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for i in range(8):
        p2, o2, loss = step(p2, o2, feed(i), jax.random.fold_in(key, i))
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / 8
    print(json.dumps({"what": "full", "ms": round(1000 * dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
