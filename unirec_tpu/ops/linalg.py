"""Blocked dense linear algebra for the solver models (EASE & friends).

XLA's one-shot LU/Cholesky lowering cannot tile past ~N=14k on a v5e (the
factorization panel overflows the 16 MB scoped VMEM), and a host LAPACK
inverse at N=20k already takes >9 minutes here — so large catalogs need a
*blocked* factorization where every step is an op XLA tiles well: small
on-device Cholesky panels (≤ block size), triangular solves, and big MXU
matmuls (SURVEY.md §7 hard-part 6; reference memory note
unirec/model/cf/ease.py:31-36).

All routines are pure jax and shape-static (the block loop is unrolled in
Python), so they jit once per (N, block) and run unchanged on a sharded
matrix: place A with PartitionSpec('model', None) on a mesh and GSPMD
partitions the matmuls / inserts the collectives.

Memory notes at N=50k f32 (10 GB for one [N, N]):
  - the trailing Cholesky update runs column-block-wise so the largest
    temporary is [N, block], never [N, N];
  - `spd_inverse_columns` streams the inverse out in [N, block] column
    slabs (caller assembles on host), so device peak is one [N, N] plus
    one slab — a full device-side P = XᵀX would need 2x [N, N].
"""
from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular


def _pad_spd(A: jnp.ndarray, nb: int) -> Tuple[jnp.ndarray, int]:
    """Pad an SPD matrix to a block multiple with an identity tail (keeps it
    SPD; the tail factors/inverts to identity and is sliced away)."""
    N = A.shape[0]
    Np = -(-N // nb) * nb
    if Np == N:
        return A, N
    pad = Np - N
    out = jnp.zeros((Np, Np), A.dtype)
    out = out.at[:N, :N].set(A)
    out = out.at[jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
    return out, N


def blocked_cholesky(A: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Lower Cholesky of SPD A via a right-looking blocked factorization.

    Every op is tile-friendly: cholesky on [nb, nb] panels, triangular
    solves [nb, nb] x [nb, N], and column-blocked trailing matmul updates
    (largest temporary [N-k*nb, nb])."""
    A, N = _pad_spd(A, nb)
    Np = A.shape[0]
    B = Np // nb
    for k in range(B):
        s = k * nb
        e = s + nb
        Akk = A[s:e, s:e]
        Lkk = jnp.linalg.cholesky(Akk)
        A = A.at[s:e, s:e].set(Lkk)
        if e < Np:
            panel = solve_triangular(Lkk, A[e:, s:e].T, lower=True).T
            A = A.at[e:, s:e].set(panel)
            # trailing update in column blocks: A[e:, j] -= panel @ L_jk^T
            for j in range(k + 1, B):
                js, je = j * nb, (j + 1) * nb
                Ljk = panel[js - e:je - e, :]
                A = A.at[je - nb:Np, js:je].add(
                    -(panel[js - e:, :] @ Ljk.T))
    L = jnp.tril(A)
    return L[:N, :N] if N != Np else L


def blocked_tri_inv_lower(L: jnp.ndarray, nb: int) -> jnp.ndarray:
    """X = L^-1 for lower-triangular L, blockwise:
        X_ii = L_ii^-1,   X_ij = -X_ii (Σ_{j<=k<i} L_ik X_kj),  i > j."""
    Lp, N = _pad_spd(L, nb)  # identity tail is its own inverse
    Np = Lp.shape[0]
    B = Np // nb
    X = jnp.zeros_like(Lp)
    eye = jnp.eye(nb, dtype=L.dtype)
    diag_inv = []
    for i in range(B):
        s, e = i * nb, (i + 1) * nb
        Xi = solve_triangular(Lp[s:e, s:e], eye, lower=True)
        diag_inv.append(Xi)
        X = X.at[s:e, s:e].set(Xi)
    for i in range(1, B):
        si, ei = i * nb, (i + 1) * nb
        # S = L[i, j..i-1] @ X[j..i-1, :ei-nb] for all j<i at once
        S = Lp[si:ei, :si] @ X[:si, :si]
        X = X.at[si:ei, :si].set(-(diag_inv[i] @ S))
    return X[:N, :N] if N != Np else X


def spd_inverse_columns(A: jnp.ndarray, nb: int,
                        out_block: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (col_start, host [N, cb] slab) of A^-1 for SPD A.

    A^-1 = Xᵀ X with X = L^-1; slabs are Xᵀ @ X[:, c:c+cb] so only one
    [N, cb] temporary exists on device at a time."""
    N = A.shape[0]
    cb = min(out_block or nb, N)
    L = jax.jit(blocked_cholesky, static_argnums=1)(A, nb)
    X = jax.jit(blocked_tri_inv_lower, static_argnums=1)(L, nb)
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
