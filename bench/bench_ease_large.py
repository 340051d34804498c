"""Large-catalog EASE solve timing (blocked Cholesky inverse, ops/linalg.py).

Round-1 ceiling: one-shot device LU dies above ~14k items (VMEM) and host
LAPACK took >9 min at N=20k. This measures the blocked device path at
EASE-scale N. Memory: one [N, N] f32 (donated through the factorization)
plus an [N, block] slab — N=50k is 10 GB on a 16 GB chip.

Run: python bench/bench_ease_large.py [N] [block]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from unirec_tpu.ops.linalg import spd_inverse_columns  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    # build the Gram on device (uploading 10 GB through the tunnel is not
    # an option): random sparse-ish interactions -> RtR + l2 I
    @jax.jit
    def make_gram(key):
        # low-rank + diagonal SPD surrogate with the same spectrum shape as
        # an interaction Gram (rank ~ n_users clipped); avoids materializing
        # a [U, N] matrix
        k1, k2 = jax.random.split(key)
        F = jax.random.normal(k1, (N, 256), jnp.float32) * 0.3
        d = jax.random.uniform(k2, (N,), jnp.float32, 0.5, 2.0)
        G = F @ F.T
        return G + jnp.diag(d + 200.0)

    t0 = time.perf_counter()
    G = make_gram(jax.random.PRNGKey(0))
    G.block_until_ready()
    t_gram = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_cols = 0
    checksum = 0.0
    for c, slab in spd_inverse_columns(G, nb):
        out_cols += slab.shape[1]
        checksum += float(np.abs(slab).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ease_blocked_inverse", "n_items": N, "block": nb,
        "gram_s": round(t_gram, 2), "inverse_s": round(dt, 2),
        "cols": out_cols, "checksum": round(checksum, 2),
    }))


if __name__ == "__main__":
    main()
