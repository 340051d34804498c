"""How does fused_catalog_topk scale with the user-batch size?

The catalog stream (the HBM floor) is amortized across the batch, but
pass-1 compute and the block-max output grow with B — this measures the
real users/sec at each batch size. Run: python bench/probe_topk_batch.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from unirec_tpu.ops import topk as T  # noqa: E402

N, K, D = 1_000_000, 100, 64


def timeit(fn, *args, steps=16):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    @jax.jit
    def make_items(key):
        return jax.random.normal(key, (N, D)).astype(jnp.bfloat16)

    items = make_items(jax.random.PRNGKey(0))
    floor_ms = 1000 * N * D * 2 / 819e9  # bf16 catalog read

    for B in (256, 1024, 2048, 4096):
        @jax.jit
        def make_users(key):
            return jax.random.normal(key, (B, D)).astype(jnp.bfloat16)

        users = make_users(jax.random.PRNGKey(B))
        fn = jax.jit(lambda u, it: T.fused_catalog_topk(u, it, K, chunk=16))
        ms = 1000 * timeit(fn, users, items)
        print(json.dumps({
            "batch": B, "ms_per_batch": round(ms, 3),
            "users_per_sec": round(B / (ms / 1000), 1),
            "x_bf16_floor": round(ms / floor_ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
