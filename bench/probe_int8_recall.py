"""Measure the int8-catalog serving mode at the serving benchmark shapes:
realized top-k ranking recall vs the full-precision catalog, and fused
top-k latency (the int8 kernel halves the catalog HBM read vs bf16 and
doubles items-per-chip capacity).

Factors are drawn both iid and low-rank structured (shared prototype
directions + noise — the trained-factor score shape), like
bench/probe_approx_recall.py.

Run on the real chip: python bench/probe_int8_recall.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unirec_tpu.ops.topk import fused_catalog_topk, quantize_catalog

N_ITEMS = 1_000_000
D = 64
B = 256
K = 100
BATCHES = 4
N_PROTO = 16


def _factors(kind, key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if kind == "iid":
        return (jax.random.normal(k2, (B, D), jnp.bfloat16),
                jax.random.normal(k1, (N_ITEMS, D), jnp.float32))
    proto = jax.random.normal(k1, (N_PROTO, D), jnp.float32)
    users = (proto[jax.random.randint(k2, (B,), 0, N_PROTO)]
             + jax.random.normal(k4, (B, D), jnp.float32))
    items = (proto[jax.random.randint(k3, (N_ITEMS,), 0, N_PROTO)]
             + jax.random.normal(k5, (N_ITEMS, D), jnp.float32))
    return users.astype(jnp.bfloat16), items


def main():
    for kind in ("iid", "lowrank"):
        @jax.jit
        def recall_batch(key, _kind=kind):
            users, items = _factors(_kind, key)
            q, scale = quantize_catalog(items)
            _, exact = fused_catalog_topk(users, items.astype(jnp.bfloat16), K)
            _, approx = fused_catalog_topk(users, q, K, item_scale=scale)

            def row_recall(e, a):
                e = jnp.sort(e)
                pos = jnp.clip(jnp.searchsorted(e, a), 0, K - 1)
                return jnp.mean((e[pos] == a).astype(jnp.float32))
            return jax.vmap(row_recall)(exact, approx)

        rs = np.concatenate([np.asarray(jax.device_get(
            recall_batch(jax.random.PRNGKey(i)))) for i in range(BATCHES)])
        print(f"{kind}: int8-catalog top-{K} recall vs full precision: "
              f"mean={rs.mean():.4f} p5={np.percentile(rs, 5):.4f} "
              f"min={rs.min():.4f} (n={rs.size})")

    # latency: bf16 vs int8 catalog through the fused kernel
    key = jax.random.PRNGKey(0)
    users, items = _factors("iid", key)
    items_bf16 = items.astype(jnp.bfloat16)
    q, scale = quantize_catalog(items)

    def timed(fn, *args):
        out = jax.jit(fn)(*args)
        jax.device_get(out[1][0, 0])
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = jax.jit(fn)(*args)
        jax.device_get(out[1][0, 0])
        return (time.perf_counter() - t0) / reps * 1e3

    t_bf16 = timed(lambda u, it: fused_catalog_topk(u, it, K),
                   users, items_bf16)
    t_int8 = timed(lambda u, it, s: fused_catalog_topk(u, it, K,
                                                       item_scale=s),
                   users, q, scale)
    print(f"fused top-{K} over {N_ITEMS} items, {B} users: "
          f"bf16 {t_bf16:.2f} ms  int8 {t_int8:.2f} ms "
          f"({B / t_int8 * 1e3:.0f} users/s; catalog "
          f"{N_ITEMS * D / 1e6:.0f} MB int8 vs {N_ITEMS * D * 2 / 1e6:.0f} MB bf16)")


if __name__ == "__main__":
    main()
