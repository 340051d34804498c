"""Per-stage timing of fused_catalog_topk: where do the 5.2 ms go?

Stages (bf16 factors, [256 users x 1M items x d=64], top-100):
  blockmax   pass-1 Pallas kernel (catalog streamed once, [B, N/chunk] out)
  blktopk    fast_topk over the [B, N/chunk] block maxima
  gather     candidate slab gather it3[blk] ([B, kp, chunk, D])
  rescore    einsum re-score + mask + final lax.top_k
  full       the whole fused_catalog_topk (sanity: ~= sum of stages)

Run: python bench/probe_topk_stages.py [chunk]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from unirec_tpu.ops import topk as T  # noqa: E402

N, B, K, D = 1_000_000, 256, 100, 64


def timeit(fn, *args, steps=32):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    item_block = min(8192, max(chunk, (2 << 20) // (2 * D) // chunk * chunk))
    kp = K  # N % chunk == 0, no history/pad exclusion

    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (N, D)).astype(jnp.bfloat16),
                jax.random.normal(k2, (B, D)).astype(jnp.bfloat16))

    items, users = make(jax.random.PRNGKey(0))
    n_pad = -(-N // item_block) * item_block

    @jax.jit
    def pad(it):
        return jnp.concatenate(
            [it, jnp.zeros((n_pad - N, D), it.dtype)])
    items_p = pad(items)

    bm_fn = jax.jit(
        lambda u, it: T.catalog_blockmax(u, it, chunk, item_block))
    bm = bm_fn(users, items_p)

    blktopk = jax.jit(lambda bm: T.fast_topk(bm, kp))
    _, blk = blktopk(bm)

    def gather(it, blk):
        return it.reshape(n_pad // chunk, chunk, D)[blk]
    gather_j = jax.jit(gather)
    cand = gather_j(items_p, blk)

    @jax.jit
    def rescore(u, cand, blk):
        sc = jnp.einsum("bd,bkcd->bkc", u, cand,
                        preferred_element_type=jnp.float32
                        ).reshape(B, kp * chunk)
        iid = (blk[..., None] * chunk
               + jnp.arange(chunk)).reshape(B, kp * chunk)
        v, ci = jax.lax.top_k(sc, K)
        return v, jnp.take_along_axis(iid, ci, axis=-1)

    full = jax.jit(lambda u, it: T.fused_catalog_topk(u, it, K, chunk=chunk))

    res = {
        "blockmax": timeit(bm_fn, users, items_p),
        "blktopk": timeit(blktopk, bm),
        "gather": timeit(gather_j, items_p, blk),
        "rescore": timeit(rescore, users, cand, blk),
        "full": timeit(full, users, items),
    }
    floor = N * D * 2 / 819e9
    print(json.dumps({
        "chunk": chunk, "item_block": item_block,
        **{k: round(1000 * v, 3) for k, v in res.items()},
        "sum_stages_ms": round(1000 * sum(v for k, v in res.items()
                                          if k != "full"), 3),
        "bf16_floor_ms": round(1000 * floor, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
