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
