"""Measure the REALIZED recall of the approximate serving path.

`reco-topk --topk_recall_target r` uses `jax.lax.approx_max_k(recall_target=r)`
(TPU PartialReduce). The r parameter is a compiler contract, not a
measurement — this probe checks what the op actually delivers at the
serving benchmark shapes (1M items x d=64, top-100, 256-user batches)
against the exact top-k of the same scores, over many random factor draws.

Run on the real chip: python bench/probe_approx_recall.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N_ITEMS = 1_000_000
D = 64
B = 256
K = 100
BATCHES = 8


def main():
    for rt in (0.9, 0.95, 0.99):
        @jax.jit
        def both(key):
            k1, k2 = jax.random.split(key)
            # generate on device (tunnel body limit) with realistic overlap:
            # users share a low-rank structure so top-k isn't pure noise
            items = jax.random.normal(k1, (N_ITEMS, D), jnp.bfloat16)
            users = jax.random.normal(k2, (B, D), jnp.bfloat16)
            scores = jnp.dot(users, items.T,
                             preferred_element_type=jnp.float32)
            _, exact = jax.lax.top_k(scores, K)
            _, approx = jax.lax.approx_max_k(scores, K, recall_target=rt)

            # per-row overlap |approx ∩ exact| / K via sorted membership
            def row_recall(e, a):
                e = jnp.sort(e)
                pos = jnp.clip(jnp.searchsorted(e, a), 0, K - 1)
                return jnp.mean((e[pos] == a).astype(jnp.float32))
            return jax.vmap(row_recall)(exact, approx)

        recalls = []
        for i in range(BATCHES):
            r = np.asarray(jax.device_get(both(jax.random.PRNGKey(i))))
            recalls.append(r)
        r = np.concatenate(recalls)
        print(f"recall_target={rt}: realized mean={r.mean():.4f} "
              f"p5={np.percentile(r, 5):.4f} min={r.min():.4f} "
              f"(n={r.size} rows)")


if __name__ == "__main__":
    main()
