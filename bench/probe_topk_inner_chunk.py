"""A/B the INNER fast_topk chunk used on the [B, N/chunk] block maxima.

probe_topk_stages showed the block-top-k selection costs 2.26 ms of the
fused path's 5.2 — dominated by lax.top_k's per-row sort width. A larger
inner chunk halves the sort width per doubling but doubles the final
survivor sort. Run: python bench/probe_topk_inner_chunk.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from unirec_tpu.ops import topk as T  # noqa: E402

B, NB, K = 256, 62500, 100


def timeit(fn, *args, steps=32):
    out = fn(*args)
    float(jax.device_get(jnp.asarray(
        jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.device_get(jnp.asarray(
        jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    bm = jax.jit(lambda k: jax.random.normal(k, (B, NB)))(
        jax.random.PRNGKey(0))
    ref_v, ref_i = jax.jit(lambda x: jax.lax.top_k(x, K))(bm)
    ref_v = jax.device_get(ref_v)

    for chunk in (16, 32, 64, 128, 256):
        fn = jax.jit(lambda x, c=chunk: T.fast_topk(x, K, chunk=c))
        v, _ = fn(bm)
        exact = bool(jnp.allclose(jnp.sort(v), jnp.sort(jnp.asarray(ref_v))))
        ms = 1000 * timeit(fn, bm)
        print(json.dumps({"inner_chunk": chunk, "ms": round(ms, 3),
                          "exact_values": exact}), flush=True)


if __name__ == "__main__":
    main()
