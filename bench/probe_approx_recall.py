"""Measure the REALIZED recall of the approximate serving path.

`reco-topk --topk_recall_target r` uses `jax.lax.approx_max_k(recall_target=r)`
(TPU PartialReduce). The r parameter is a compiler contract, not a
measurement — this probe checks what the op actually delivers at the
serving benchmark shapes (1M items x d=64, top-100, 256-user batches)
against the exact top-k of the same scores, over many random factor draws.

Two score distributions are measured, because realized recall depends on
how concentrated the score tails are:
  - "iid": fully isotropic Gaussian users/items (flattest possible tails —
    the hardest case for a partial-reduce selector in expectation);
  - "lowrank": users and items share a small set of prototype directions
    plus noise, which concentrates each row's top scores the way trained
    MF/two-tower factors do.

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


N_PROTO = 16       # shared prototype directions (lowrank mode)
PROTO_SCALE = 1.0  # prototype strength relative to unit noise


def _factors(kind, key):
    """Generate (users, items) on device (tunnel body limit)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if kind == "iid":
        items = jax.random.normal(k1, (N_ITEMS, D), jnp.bfloat16)
        users = jax.random.normal(k2, (B, D), jnp.bfloat16)
        return users, items
    # lowrank: users and items mix a few shared prototype vectors plus
    # isotropic noise, so each user's score row has a concentrated head
    # (items aligned with its prototype) and a noise tail — the shape
    # trained two-tower factors actually have.
    proto = jax.random.normal(k1, (N_PROTO, D), jnp.float32)
    u_assign = jax.random.randint(k2, (B,), 0, N_PROTO)
    i_assign = jax.random.randint(k3, (N_ITEMS,), 0, N_PROTO)
    users = (PROTO_SCALE * proto[u_assign]
             + jax.random.normal(k4, (B, D), jnp.float32))
    items = (PROTO_SCALE * proto[i_assign]
             + jax.random.normal(k5, (N_ITEMS, D), jnp.float32))
    return users.astype(jnp.bfloat16), items.astype(jnp.bfloat16)


def main():
    for kind in ("iid", "lowrank"):
        for rt in (0.9, 0.95, 0.99):
            @jax.jit
            def both(key, _kind=kind, _rt=rt):
                users, items = _factors(_kind, key)
                scores = jnp.dot(users, items.T,
                                 preferred_element_type=jnp.float32)
                _, exact = jax.lax.top_k(scores, K)
                _, approx = jax.lax.approx_max_k(scores, K,
                                                 recall_target=_rt)

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
            print(f"{kind}: recall_target={rt}: realized mean={r.mean():.4f} "
                  f"p5={np.percentile(r, 5):.4f} min={r.min():.4f} "
                  f"(n={r.size} rows)")


if __name__ == "__main__":
    main()
