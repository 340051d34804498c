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

def colmajor_format(device=None):
    """Column-major device Format for the big [N, N] operand, or None.

    XLA's cholesky/triangular-solve custom-calls require column-major
    inputs; with the default row-major parameter, layout assignment
    converts the ENTIRE aliased update chain with one full-size copy
    (9.3 GB at N=50k — measured OOM; HLO-verified at N=12k:
    ``copy.65 = f32[...]{0,1} copy(A.1)``). Keeping the matrix
    column-major end to end removes the copy. The matrices here are
    symmetric, so a column-major buffer holds the same values.

    Lazy (a Format needs a concrete sharding, and building one touches
    the backend) — call at use time, never at import."""
    try:  # jax >= 0.9
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
    except ImportError:  # pragma: no cover - older jax
        return None
    dev = device if device is not None else jax.devices()[0]
    return Format(Layout(major_to_minor=(1, 0)), SingleDeviceSharding(dev))


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
            # panel = A[e:, s:e] @ Lkk^-T via an explicit [nb, nb]
            # triangular inverse + one MXU matmul. A direct
            # solve_triangular with the [nb, N-e] RHS lowers to XLA's
            # internal blocked solve whose ~nb/128 update temps (each
            # [*, N-e]) are all live at once — ~11 GB at N=50k, the
            # measured OOM. The inverse keeps every temp ≤ [N-e, nb].
            inv_Lkk = solve_triangular(Lkk, jnp.eye(e - s, dtype=A.dtype),
                                       lower=True)
            # einsum (contract on the second axis of both) instead of
            # `@ inv_Lkk.T`: dot dimension numbers instead of explicit
            # transposes of A-derived operands
            panel = jnp.einsum("ik,jk->ij", A[e:, s:e], inv_Lkk)
            A = A.at[e:, s:e].set(panel)
            del panel
            # trailing update in column blocks: A[e:, j] -= panel @ L_jk^T.
            # The panel rows are READ BACK from A (just written above)
            # instead of sliced from the `panel` value: slices of a live
            # value have no ordering edges, so XLA hoists all ~N/nb of
            # them and their products ahead of the update chain — at
            # N=50k that is 13 concurrent ~0.7 GB temps, 21.5 GB total
            # program memory (measured OOM). Reading through A serializes
            # each slice+product behind the previous dynamic-update-slice,
            # so peak = A + one slice + one product.
            for js, je in bounds[k + 1:]:
                Ljk = A[js:je, s:e]
                A = A.at[js:N, js:je].add(
                    -jnp.einsum("ik,jk->ij", A[js:N, s:e], Ljk))
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
    bounds = _block_bounds(N, nb)
    L = jnp.tril(L)
    for i, (s, e) in enumerate(bounds):
        Xi = solve_triangular(L[s:e, s:e], jnp.eye(e - s, dtype=L.dtype),
                              lower=True)
        # X_i,j = -Xi (Σ_{k≥j} L_i,k X_k,j), column block by column block,
        # ascending j. A single `L[s:e, :s] @ L[:s, :s]` needs the [s, s]
        # slice materialized as a matmul operand (non-contiguous → copy):
        # at N=50k the last row block would copy a ~9.7 GB square next to
        # the 10 GB matrix. Per column block both operands are ≤ [s, nb],
        # and both READ THE EVOLVING L (row strip columns ≥ cs are still
        # original L because blocks are written left-to-right; rows cs:s
        # of columns cs:ce are already X), so every slice+product is
        # serialized behind the previous update instead of hoisted —
        # the same scheduling hazard measured in blocked_cholesky.
        # X_k,j = 0 for k < j keeps the shortened contraction exact.
        for cs, ce in bounds[:i]:
            Scol = L[s:e, cs:s] @ L[cs:s, cs:ce]
            L = L.at[s:e, cs:ce].set(-(Xi @ Scol))
        L = L.at[s:e, s:e].set(Xi)
    return L


def blocked_tri_inv_upper(U: jnp.ndarray, nb: int,
                          assume_triangular: bool = False) -> jnp.ndarray:
    """X = U^-1 for upper-triangular U, blockwise and in place.

    The exact transpose of :func:`blocked_tri_inv_lower` — it exists for
    layout reasons: the cholesky factorization chain is column-major (the
    custom-calls demand it), while a tri-inverse is all plain matmuls,
    which XLA prefers row-major — inverting L directly makes layout
    assignment convert the whole [N, N] buffer twice (measured OOM at
    N=50k). A column-major LOWER L is bit-identical to a row-major UPPER
    U = Lᵀ, so ``blocked_tri_inv_upper(L.T)`` costs a free bitcast
    instead, and (Lᵀ)⁻¹ = Xᵀ feeds A⁻¹ = XᵀX = X_U @ X_Uᵀ directly.

    Same serialization discipline as the lower routine: both matmul
    operands read the EVOLVING U so slices can't be hoisted together."""
    N = U.shape[0]
    bounds = _block_bounds(N, nb)
    if not assume_triangular:
        U = jnp.triu(U)
    for i, (s, e) in enumerate(bounds):
        Xi = solve_triangular(U[s:e, s:e], jnp.eye(e - s, dtype=U.dtype),
                              lower=False)
        for cs, ce in bounds[:i]:
            Scol = U[cs:ce, cs:s] @ U[cs:s, s:e]
            U = U.at[cs:ce, s:e].set(-(Scol @ Xi))
        U = U.at[s:e, s:e].set(Xi)
    return U


def spd_inverse_columns(A: jnp.ndarray, nb: int,
                        out_block: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (col_start, host [N, cb] slab) of A^-1 for SPD A.

    A^-1 = Xᵀ X with X = L^-1; slabs are Xᵀ @ X[:, c:c+cb] so only one
    [N, cb] temporary exists on device at a time. A is DONATED through the
    factorization chain: device peak is one [N, N] plus a slab."""
    N = A.shape[0]
    cb = min(out_block or nb, N)
    fmt = colmajor_format()
    chol_kw = {}
    if fmt is not None:
        # keep the factorization chain column-major (colmajor_format
        # note); callers should device_put the input with that Format so
        # the jit boundary does not itself insert the conversion copy
        chol_kw = {"in_shardings": fmt, "out_shardings": fmt}
    L = jax.jit(blocked_cholesky, static_argnums=1, donate_argnums=0,
                **chol_kw)(A, nb)

    # invert the TRANSPOSE: the column-major lower L re-enters as a
    # (bitcast-free) row-major upper U = Lᵀ, whose inversion is all
    # row-major matmuls — no layout conversion of the [N, N] buffer
    # (see blocked_tri_inv_upper). X_U = U⁻¹ = (L⁻¹)ᵀ = Xᵀ.
    def _tri_inv_t(L, nb):
        return blocked_tri_inv_upper(jnp.swapaxes(L, 0, 1), nb,
                                     assume_triangular=True)

    tri_kw = {"in_shardings": fmt} if fmt is not None else {}
    XU = jax.jit(_tri_inv_t, static_argnums=1, donate_argnums=0,
                 **tri_kw)(L, nb)
    del L, A

    @jax.jit
    def slab(XU, c):
        # A⁻¹ = XᵀX = X_U @ X_Uᵀ; column slab j∈[c, c+cb) contracts over
        # X_U's second axis with a ROW slice of X_U — contiguous in the
        # row-major layout, and no explicit [N, N] transpose is formed
        # (an explicit X.T materialized a copy per slab: 7.4 s at N=20k)
        rows = jax.lax.dynamic_slice(XU, (c, 0), (cb, N))
        return jnp.einsum("ik,jk->ij", XU, rows,
                          preferred_element_type=XU.dtype)

    for c in range(0, N - cb + 1, cb):
        yield c, np.asarray(slab(XU, c))
    rem = N % cb
    if rem:
        c = N - rem
        full = np.asarray(slab(XU, N - cb))  # last full-width slab
        yield c, full[:, cb - rem:]


def spd_inverse(A: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Full device-side A^-1 = Xᵀ X (needs 2x [N, N] on device — use
    ``spd_inverse_columns`` for catalogs near the HBM limit)."""
    L = blocked_cholesky(A, nb)
    X = blocked_tri_inv_lower(L, nb)
    return X.T @ X
