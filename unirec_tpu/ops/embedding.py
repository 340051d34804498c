"""Embedding gather with a sort-based backward scatter.

The backward of a plain table gather is a scatter-add of [M, D] gradient
rows at M arbitrary ids. Per-op profiling of the bench train step
(bench/xplane.py) shows XLA's scatter for the item_seq gather (1.6M ids
into [50k, 64]) costing ~22 ms — an order of magnitude over its memory
roofline — because unsorted duplicate indices serialize the combine.

This custom-vjp gather sorts the gradient rows by id first and then
scatter-adds with ``indices_are_sorted=True``: the sort is a cheap 1-D key
sort plus one [M, D] permutation gather, and the sorted scatter vectorizes.
Numerics are identical (same additions, different order — f32 rounding
differences only). Gated by config ``sorted_embedding_grad``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return table[ids]


def _gather_fwd(table, ids):
    # residuals must be jax values; the table rides along as a (free)
    # reference so bwd can read its shape/dtype
    return table[ids], (ids, table)


def _gather_bwd(res, g):
    ids, table = res
    shape, dtype = table.shape, table.dtype
    ids_flat = ids.reshape(-1)
    g_flat = g.reshape(-1, shape[-1]).astype(dtype)
    order = jnp.argsort(ids_flat)
    sorted_ids = ids_flat[order]
    sorted_g = g_flat[order]
    dtable = jnp.zeros(shape, dtype).at[sorted_ids].add(
        sorted_g, indices_are_sorted=True)
    return dtable, None


gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_expand(table: jnp.ndarray, ids: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gather whose backward spreads duplicate-id rows over ``k`` slots.

    XLA's scatter-add serializes the combine over rows with the same id; at
    bench shapes (1.6M uniform ids into [50k, 64], ~32 duplicates/id) that
    measured ~10x over the memory roofline, and under a long-tail (zipf)
    id distribution it degrades to seconds (bench/bench_scatter.py:
    plain 20.9 s vs expand 0.3 s at the same shapes).

    Backward here scatters row i into slot ``id*k + i % k`` of a [N*k, D]
    buffer — dropping the expected collision depth k-fold — then reduces
    the k slots with one dense sum. Costs a k-times-larger intermediate
    (+ its read-back), so it pays off only when duplicates actually
    serialize; gated by config ``expand_embedding_grad = k``. Numerics:
    the same additions in a different order.
    """
    return table[ids]


def _gather_expand_fwd(table, ids, k):
    return table[ids], (ids, table)


def _gather_expand_bwd(k, res, g):
    ids, table = res
    (n, d), dtype = table.shape, table.dtype
    ids_flat = ids.reshape(-1)
    g_flat = g.reshape(-1, d).astype(dtype)
    m = ids_flat.shape[0]
    slot = ids_flat * k + (jnp.arange(m, dtype=ids_flat.dtype) % k)
    wide = jnp.zeros((n * k, d), dtype).at[slot].add(g_flat)
    return wide.reshape(n, k, d).sum(axis=1, dtype=dtype), None


gather_expand.defvjp(_gather_expand_fwd, _gather_expand_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_cast(table: jnp.ndarray, ids: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Gather from a cast-to-compute-dtype table whose backward scatters in
    the PARAM dtype.

    The default bf16-table path (flax ``nn.Embed(dtype=bf16)``) autodiffs to
    a bf16 scatter-add followed by a bf16->f32 convert of the [N, D] result.
    A bf16 scatter combines duplicate ids with 2-byte read-modify-writes;
    this variant feeds the scatter f32 rows instead (the grad rows double in
    size, but the combine works on 4-byte lanes and the [N, D] convert
    disappears). Forward numerics identical to the default path (same cast,
    same gather). Gated by config ``embedding_grad_f32``; keep whichever the
    in-step A/B favors (bench/bench_step_variants.py).
    """
    return table.astype(compute_dtype)[ids]


def _gather_cast_fwd(table, ids, compute_dtype):
    return table.astype(compute_dtype)[ids], (ids, table)


def _gather_cast_bwd(compute_dtype, res, g):
    ids, table = res
    (n, d), dtype = table.shape, table.dtype
    ids_flat = ids.reshape(-1)
    g_flat = g.reshape(-1, d).astype(dtype)
    return jnp.zeros((n, d), dtype).at[ids_flat].add(g_flat), None


gather_cast.defvjp(_gather_cast_fwd, _gather_cast_bwd)


def segment_sum_scan(ids: jnp.ndarray, g: jnp.ndarray, n_rows: int,
                     chunk: int = 256) -> jnp.ndarray:
    """Scatter-FREE segment sum of gradient rows: ``out[i] = sum of g rows
    whose id == i`` computed entirely with sort + matmul + gathers.

    Why: XLA's TPU scatter-add processes update rows one dynamic-update-
    slice at a time (~15 ns/row measured); at the bench step's 1.6M rows
    that is ~24 ms — 20% of the whole train step and ~90x its memory
    roofline. Every scatter-shaped reformulation (sorted ids, k-slot
    expansion, f32 rows) stays on that serial path. This routine removes
    the scatter:

      1. sort rows by id (XLA's 1-D key/index sort: ~1.7 ms at 1.6M),
      2. inclusive cumsum of the sorted rows — blocked: within each
         ``chunk`` rows as a lower-triangular matmul on the MXU
         (scan-as-matmul), across chunks as a tiny [M/chunk, D] cumsum,
      3. per id, segment sum = cum[last_occurrence] - cum[first-1] via
         two gathers at searchsorted boundaries.

    Everything is data-parallel; the MXU does the combine. Accumulation is
    f32 regardless of ``g``'s dtype (the matmul accumulator), which is
    strictly better numerics than a bf16 scatter's 2-byte read-modify-write
    chain. Output is f32 [n_rows, D].
    """
    m, d = g.shape
    ids = ids.astype(jnp.int32)
    pad = (-m) % chunk
    if pad:
        # sentinel id n_rows sorts after every real id; zero rows
        ids = jnp.concatenate([ids, jnp.full((pad,), n_rows, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((pad, d), g.dtype)])
    M = ids.shape[0]
    sids, order = jax.lax.sort_key_val(ids, jnp.arange(M, dtype=jnp.int32))
    sg = jnp.take(g, order, axis=0)

    nc = M // chunk
    lt = jnp.tril(jnp.ones((chunk, chunk), sg.dtype))
    # [nc, chunk, d] inclusive cumsum within each chunk, f32 accumulate.
    # bf16 rows: one MXU pass is exact (0/1 multiplier, f32 accumulator) —
    # the same additions a bf16 scatter would do, but f32-accumulated.
    # f32 rows: force HIGHEST so the TPU's single bf16 pass doesn't round
    # the inputs to 8 mantissa bits.
    prec = (jax.lax.Precision.HIGHEST
            if sg.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    intra = jnp.einsum("ij,cjd->cid", lt, sg.reshape(nc, chunk, d),
                       preferred_element_type=jnp.float32, precision=prec)
    totals = intra[:, -1, :]                        # [nc, d]
    prefix = jnp.cumsum(totals, axis=0) - totals    # exclusive chunk prefix
    cum = (intra + prefix[:, None, :]).reshape(M, d)

    all_ids = jnp.arange(n_rows, dtype=jnp.int32)
    right = jnp.searchsorted(sids, all_ids, side="right")
    left = jnp.searchsorted(sids, all_ids, side="left")
    has = (right > left)[:, None]
    last = jnp.take(cum, jnp.maximum(right - 1, 0), axis=0)
    prev = jnp.where((left > 0)[:, None],
                     jnp.take(cum, jnp.maximum(left - 1, 0), axis=0), 0.0)
    return jnp.where(has, last - prev, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_scan(table: jnp.ndarray, ids: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Gather from a cast-to-compute-dtype table whose backward builds the
    table gradient with ``segment_sum_scan`` — no scatter anywhere.

    Forward numerics identical to ``nn.Embed(dtype=compute_dtype)``
    (cast the table, then gather). Backward numerics: the same row sums,
    accumulated in f32 on the MXU instead of serial bf16 read-modify-write
    (equal or better). Gated by config ``scan_embedding_grad``.
    """
    t = table if compute_dtype is None else table.astype(compute_dtype)
    return t[ids]


def _gather_scan_fwd(table, ids, compute_dtype):
    return gather_scan(table, ids, compute_dtype), (ids, table)


def _gather_scan_bwd(compute_dtype, res, g):
    ids, table = res
    (n, d), dtype = table.shape, table.dtype
    dtable = segment_sum_scan(ids.reshape(-1), g.reshape(-1, d), n)
    return dtable.astype(dtype), None


gather_scan.defvjp(_gather_scan_fwd, _gather_scan_bwd)
