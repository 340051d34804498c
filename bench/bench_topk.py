"""Honest full-catalog top-k serving benchmark.

Round-1 claimed 0.04 ms / 256-user batch over 1M items — 8x above the
chip's HBM bandwidth, i.e. dispatch was measured. The floor is the catalog
read: 1M x 64 f32 = 256 MB per batch at 819 GB/s = 0.31 ms.

Run: python bench/bench_topk.py [n_items] [batch] [topk]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    D = 64

    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (N, D), jnp.float32),
                jax.random.normal(k2, (B, D), jnp.float32))

    items, users = make(jax.random.PRNGKey(0))

    from unirec_tpu.ops.topk import fast_topk, fused_catalog_topk

    def dense(u, it):
        return jax.lax.dot_general(u, it, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # bf16 factors: the serving-recommended table dtype — halves the catalog
    # read and runs the MXU at full rate; exact w.r.t. the bf16 score function
    items_bf, users_bf = (jnp.asarray(items, jnp.bfloat16),
                          jnp.asarray(users, jnp.bfloat16))
    variants = {
        "lax_top_k": (lambda u, it: jax.lax.top_k(u @ it.T, K), False),
        "fast_exact": (lambda u, it: fast_topk(u @ it.T, K), False),
        "fused_exact": (lambda u, it: fused_catalog_topk(u, it, K), False),
        "fast_exact_bf16": (lambda u, it: fast_topk(dense(u, it), K), True),
        "fused_exact_bf16": (lambda u, it: fused_catalog_topk(u, it, K),
                             True),
        "approx_95": (lambda u, it: fast_topk(u @ it.T, K, exact=False,
                                              recall_target=0.95), False),
    }
    floor = N * D * 4 / 819e9
    for name, (fn, use_bf) in variants.items():
        @jax.jit
        def topk(users, items, fn=fn):
            return fn(users, items)

        u_in, it_in = (users_bf, items_bf) if use_bf else (users, items)
        vals, ids = topk(u_in, it_in)
        float(jax.device_get(vals[0, 0]))
        steps = 4 if name == "lax_top_k" else 32
        t0 = time.perf_counter()
        for _ in range(steps):
            vals, ids = topk(u_in, it_in)
        float(jax.device_get(vals[0, 0]))
        dt = (time.perf_counter() - t0) / steps
        print(json.dumps({
            "metric": "full_catalog_topk", "variant": name,
            "n_items": N, "batch": B, "k": K,
            "ms_per_batch": round(1000 * dt, 3),
            "users_per_sec": round(B / dt, 1),
            "hbm_floor_ms": round(1000 * floor, 3),
            "x_floor": round(dt / floor, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
