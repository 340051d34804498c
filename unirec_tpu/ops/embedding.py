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
