"""Blocked dense linear algebra for the solver models (EASE & friends).

XLA's one-shot LU/Cholesky lowering cannot tile past ~N=14k on a v5e (the
factorization panel overflows the 16 MB scoped VMEM), and a host LAPACK
inverse at N=20k already takes >9 minutes here — so large catalogs need a
*blocked* factorization where every step is an op XLA tiles well: small
on-device Cholesky panels (≤ block size), triangular solves, and big MXU
matmuls (SURVEY.md §7 hard-part 6; reference memory note
unirec/model/cf/ease.py:31-36).

All routines are pure jax and shape-static (the block loop is unrolled in
Python; a ragged final block is handled with its own shapes rather than by
padding, so no [N, N] pad copy is ever made), and they run unchanged on a
sharded matrix: place A with PartitionSpec('model', None) on a mesh and
GSPMD partitions the matmuls / inserts the collectives.

Memory notes at N=50k f32 (10 GB for one [N, N] on a 16 GB chip):
  - the trailing Cholesky update runs column-block-wise so the largest
    temporary is [N, block], never [N, N];
  - `blocked_tri_inv_lower` writes the inverse *into* L's buffer (row
    block i only needs L's row i and already-inverted rows < i), so with
    donation the whole chol → tri-inv chain peaks at one [N, N];
  - `spd_inverse_columns` donates through that chain and streams the
    inverse out in [N, block] column slabs (caller assembles on host) — a
    full device-side P = XᵀX would need 2x [N, N].
"""
from __future__ import annotations

from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular


def _block_bounds(N: int, nb: int) -> List[Tuple[int, int]]:
    """[start, end) bounds of nb-sized blocks; the last may be ragged."""
    return [(s, min(s + nb, N)) for s in range(0, N, nb)]


def blocked_cholesky(A: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Lower Cholesky of SPD A via a right-looking blocked factorization.

    Every op is tile-friendly: cholesky on [nb, nb] panels, triangular
    solves [nb, nb] x [nb, N], and column-blocked trailing matmul updates
    (largest temporary [N-k*nb, nb]). Safe to donate A into the jit."""
    N = A.shape[0]
    bounds = _block_bounds(N, nb)
    for k, (s, e) in enumerate(bounds):
        Lkk = jnp.linalg.cholesky(A[s:e, s:e])
        A = A.at[s:e, s:e].set(Lkk)
        if e < N:
            panel = solve_triangular(Lkk, A[e:, s:e].T, lower=True).T
            A = A.at[e:, s:e].set(panel)
            # trailing update in column blocks: A[e:, j] -= panel @ L_jk^T
            for js, je in bounds[k + 1:]:
                Ljk = panel[js - e:je - e, :]
                A = A.at[js:N, js:je].add(-(panel[js - e:, :] @ Ljk.T))
    return jnp.tril(A)


def blocked_tri_inv_lower(L: jnp.ndarray, nb: int) -> jnp.ndarray:
    """X = L^-1 for lower-triangular L, blockwise and in place:
        X_ii = L_ii^-1,   X_ij = -X_ii (L_i,<i @ X_<i,<i),   i > j.

    Row block i reads only L's row i (not yet overwritten) and X's rows
    < i (already written), so the result is built inside L's own buffer —
    with donation the inverse costs no second [N, N]. The strict upper
    triangle is zeroed at entry (an aliasing-friendly elementwise pass; it
    becomes X's upper zeros as rows are overwritten)."""
    N = L.shape[0]
    L = jnp.tril(L)
    for i, (s, e) in enumerate(_block_bounds(N, nb)):
        Xi = solve_triangular(L[s:e, s:e], jnp.eye(e - s, dtype=L.dtype),
                              lower=True)
        if i:
            S = L[s:e, :s] @ L[:s, :s]
            L = L.at[s:e, :s].set(-(Xi @ S))
        L = L.at[s:e, s:e].set(Xi)
    return L


def spd_inverse_columns(A: jnp.ndarray, nb: int,
                        out_block: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (col_start, host [N, cb] slab) of A^-1 for SPD A.

    A^-1 = Xᵀ X with X = L^-1; slabs are Xᵀ @ X[:, c:c+cb] so only one
    [N, cb] temporary exists on device at a time. A is DONATED through the
    factorization chain: device peak is one [N, N] plus a slab."""
    N = A.shape[0]
    cb = min(out_block or nb, N)
    L = jax.jit(blocked_cholesky, static_argnums=1, donate_argnums=0)(A, nb)
    X = jax.jit(blocked_tri_inv_lower, static_argnums=1,
                donate_argnums=0)(L, nb)
    del L, A

    @jax.jit
    def slab(X, c):
        cols = jax.lax.dynamic_slice(X, (0, c), (N, cb))
        # contract over the leading axis instead of forming X.T — the
        # explicit transpose materializes an [N, N] copy per slab
        # (measured 7.4 s/slab at N=20k vs sub-second without)
        return jnp.einsum("ki,kj->ij", X, cols,
                          preferred_element_type=X.dtype)

    for c in range(0, N - cb + 1, cb):
        yield c, np.asarray(slab(X, c))
    rem = N % cb
    if rem:
        c = N - rem
        full = np.asarray(slab(X, N - cb))  # last full-width slab
        yield c, full[:, cb - rem:]


def spd_inverse(A: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Full device-side A^-1 = Xᵀ X (needs 2x [N, N] on device — use
    ``spd_inverse_columns`` for catalogs near the HBM limit)."""
    L = blocked_cholesky(A, nb)
    X = blocked_tri_inv_lower(L, nb)
    return X.T @ X
