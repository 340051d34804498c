"""Large-catalog EASE solve timing (blocked Cholesky inverse, ops/linalg.py).

Round-1 ceiling: one-shot device LU dies above ~14k items (VMEM) and host
LAPACK took >9 min at N=20k. This measures the blocked device path at
EASE-scale N. Memory: one [N, N] f32 (donated through the factorization)
plus an [N, block] slab — N=50k is 10 GB on a 16 GB chip.

Run: python bench/bench_ease_large.py [N] [block]
"""
from __future__ import annotations

import functools
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
    # an option): random sparse-ish interactions -> RtR + l2 I.
    # Produced COLUMN-MAJOR so the factorization chain never needs the
    # full-matrix layout-conversion copy (ops/linalg.py COLMAJOR note).
    from unirec_tpu.ops.linalg import colmajor_format

    COLMAJOR = colmajor_format()
    gram_kw = {"out_shardings": COLMAJOR} if COLMAJOR is not None else {}

    @functools.partial(jax.jit, **gram_kw)
    def make_gram(key):
        # low-rank + diagonal SPD surrogate with the same spectrum shape as
        # an interaction Gram (rank ~ n_users clipped); avoids materializing
        # a [U, N] matrix
        k1, k2 = jax.random.split(key)
        F = jax.random.normal(k1, (N, 256), jnp.float32) * 0.3
        d = jax.random.uniform(k2, (N,), jnp.float32, 0.5, 2.0)
        G = F @ F.T
        # add the diagonal IN PLACE: `G + jnp.diag(...)` materializes a
        # second [N, N] (jnp.diag lowers to a dense scatter) — at N=50k
        # that is 2x 10 GB and OOMs the 16 GB chip before the solver runs
        idx = jnp.arange(N)
        return G.at[idx, idx].add(d + 200.0)

    t0 = time.perf_counter()
    G = make_gram(jax.random.PRNGKey(0))
    G.block_until_ready()
    t_gram = time.perf_counter() - t0

    from unirec_tpu.ops.linalg import blocked_cholesky, blocked_tri_inv_upper

    # phase 1: factorization+inverse, compile vs steady-state separated.
    # Everything is DONATED down the chain (G→L→X_U): at N=50k each [N, N]
    # is 10 GB, so only one may be alive at a time on a 16 GB chip. The
    # chol chain runs column-major (custom-call requirement), the
    # tri-inverse on the bitcast-transposed upper runs row-major — no
    # [N, N] layout-conversion copies anywhere (ops/linalg.py).
    fac_kw = dict(gram_kw, in_shardings=COLMAJOR) if COLMAJOR is not None \
        else {}
    tri_kw = {"in_shardings": COLMAJOR} if COLMAJOR is not None else {}
    chol = jax.jit(blocked_cholesky, static_argnums=1, donate_argnums=0,
                   **fac_kw)

    def _tri_inv_t(L, nb):
        return blocked_tri_inv_upper(jnp.swapaxes(L, 0, 1), nb,
                                     assume_triangular=True)

    triinv = jax.jit(_tri_inv_t, static_argnums=1, donate_argnums=0,
                     **tri_kw)
    # sync with device_get, not block_until_ready: the latter has been
    # observed not to wait on this backend (docs/performance_notes.md),
    # and an un-waited cold pass still holds its buffers when the warm
    # phase allocates -> transient 3x [N, N] -> runtime OOM at N=50k
    t0 = time.perf_counter()
    L = chol(G, nb)
    float(jax.device_get(L[0, 0]))
    t_chol_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    X = triinv(L, nb)
    float(jax.device_get(X[0, 0]))
    t_tri_cold = time.perf_counter() - t0

    # steady state (compile cache hot): regenerate G (the cold pass
    # consumed it) and rerun
    X.delete()
    del X
    G = make_gram(jax.random.PRNGKey(0))
    float(jax.device_get(G[0, 0]))
    t0 = time.perf_counter()
    X = triinv(chol(G, nb), nb)
    # block_until_ready on this backend has been observed not to wait
    # (see docs/performance_notes.md) — force a real round-trip
    float(jax.device_get(X[0, 0]))
    t_factor_warm = time.perf_counter() - t0

    # phase 2a: device-only column sweep (checksum reduce, no host transfer)
    @jax.jit
    def slab_sum(XU, c):
        rows = jax.lax.dynamic_slice(XU, (c, 0), (nb, N))
        return jnp.abs(jnp.einsum("ik,jk->ij", XU, rows)).sum()

    t0 = time.perf_counter()
    acc = 0.0
    for c in range(0, N, nb):
        acc += float(slab_sum(X, min(c, N - nb)))
    t_cols_device = time.perf_counter() - t0

    # phase 2b: full streamed inverse incl. host transfer (tunnel-bound in
    # this dev environment: ~N*N*4 bytes over the relay — ~7 min at N=50k,
    # so it is skipped above 20k unless a 3rd arg 'stream' forces it)
    t_streamed = out_cols = None
    if N <= 20_000 or (len(sys.argv) > 3 and sys.argv[3] == "stream"):
        del X  # spd_inverse_columns builds its own [N, N] chain
        G = make_gram(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        out_cols = 0
        for c, slab in spd_inverse_columns(G, nb):
            out_cols += slab.shape[1]
        t_streamed = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "metric": "ease_blocked_inverse", "n_items": N, "block": nb,
        "gram_s": round(t_gram, 2),
        "chol_cold_s": round(t_chol_cold, 2),
        "triinv_cold_s": round(t_tri_cold, 2),
        "factor_warm_s": round(t_factor_warm, 2),
        "column_sweep_device_s": round(t_cols_device, 2),
        "streamed_total_s": t_streamed,
        "cols": out_cols, "checksum": round(acc, 2),
    }))


if __name__ == "__main__":
    main()
