"""Embedding-grad scatter-add with the whole table resident in VMEM.

The bench train step's biggest single op is the item_seq embedding-grad
scatter: 1.6M [64]-wide bf16 rows into a [50k, 64] table, ~24 ms — an
issue-rate wall of ~15 ns per random 128-byte HBM row access that sorting
cannot beat (XLA's scatter lowering also sorts; see
docs/performance_notes.md "round 5"). This kernel removes HBM from the
random-access path entirely: the full [N, D] accumulator lives in VMEM
across a sequential grid over gradient-row blocks, each row doing a
dynamic-index read-modify-write in VMEM; the table is written back to HBM
once at the end.

Fits when N * D * itemsize (plus lane padding to 128) stays under the
~16 MB scoped-VMEM budget — e.g. 50k x 64 bf16 (12.8 MB padded). Gated by
``scatter_vmem_supported``.

MEASURED (v5e, r5): micro 21 ms vs XLA's in-step 24 ms at M=1.6M /
N=50k / D=64 (block=2048 is the sweet spot: 1024 -> 658 ms, 4096 ->
28.5 ms, 8192 -> 11 s — SMEM block layouts off the fast path);
IN-STEP via bench/bench_step_variants.py fused+vmemscatter:
**108.7 -> 97.5 ms/step, identical loss** — bigger than the micro delta
because it also absorbs the candidate-grad scatter (4.6 ms) and the
reshape/clamp glue feeding both. The packed two-accumulator variant
(scatter_add_rows2 below) measured 66 ms — the wider tiles and
alternating output refs cost more than the halved RMW chain saves; kept
as the documented negative.

No reference counterpart (the reference has no kernels; its scatter is
torch's). Used by ``gather_vmem`` as a drop-in embedding-gather whose
backward runs here; config flag ``vmem_embedding_grad`` (default ON, TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _scatter_kernel(ids_ref, g_ref, acc_ref, *, R, S):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    D = g_ref.shape[1]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)

    def body(r, _):
        # Mosaic only allows 8-aligned dynamic sublane access, so both
        # sides work on aligned 8-row tiles: load 8 gradient rows at once,
        # then per row keep its source sublane s, rotate it to the target
        # sublane idx%8 (pltpu.roll, dynamic shift), and RMW the aligned
        # 8-row accumulator tile.
        base = pl.multiple_of(r * 8, 8)
        # Mosaic's dynamic rotate is 32-bit only: convert the whole 8-row
        # tile to f32 ONCE instead of per row
        gtile32 = g_ref[pl.ds(base, 8), :].astype(jnp.float32)
        dt = g_ref.dtype
        for s in range(8):
            idx = ids_ref[base + s]
            tbase = pl.multiple_of((idx // 8) * 8, 8)
            tsub = idx - tbase
            keep = jnp.where(sub_iota == s, gtile32, 0.0)
            contrib = pltpu.roll(keep, shift=tsub - s, axis=0).astype(dt)
            acc_ref[pl.ds(tbase, 8), :] = (
                acc_ref[pl.ds(tbase, 8), :] + contrib)
        return 0

    jax.lax.fori_loop(0, R // 8, body, 0, unroll=False)


def scatter_add_rows(ids: jnp.ndarray, g: jnp.ndarray, n_rows: int,
                     block: int = 2048, unroll: int = 8) -> jnp.ndarray:
    """sum_i onehot(ids[i]) * g[i] -> [n_rows, D], accumulated in VMEM.

    ids: [M] int32 (all in [0, n_rows)); g: [M, D]. Returns g.dtype.
    M is padded to a block multiple with id 0 / zero rows (exact: adds 0).
    """
    M, D = g.shape
    Mp = -(-M // block) * block
    if Mp != M:
        ids = jnp.pad(ids, (0, Mp - M))
        g = jnp.pad(g, ((0, Mp - M), (0, 0)))
    ids1 = ids.astype(jnp.int32)
    kern = functools.partial(_scatter_kernel, R=block, S=unroll)
    # accumulator rows 8-aligned, or the boundary tile RMW runs out of
    # bounds; slice the padding off after
    n_pad = -(-n_rows // 8) * 8
    out = pl.pallas_call(
        kern,
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), g.dtype),
        interpret=_INTERPRET,
    )(ids1, g)
    return out[:n_rows] if n_pad != n_rows else out


def scatter_vmem_supported(n_rows: int, d: int, dtype) -> bool:
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    lanes = max(d, 128)  # VMEM lane padding
    return n_rows * lanes * itemsize <= 13 * 2 ** 20


@jax.custom_vjp
def gather_vmem(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] whose backward scatter-accumulates in VMEM."""
    return table[ids]


def _gather_vmem_fwd(table, ids):
    return table[ids], (ids, table)


def _gather_vmem_bwd(res, g):
    ids, table = res
    (n, d), dtype = table.shape, table.dtype
    g_flat = g.reshape(-1, d).astype(dtype)
    return scatter_add_rows(ids.reshape(-1), g_flat, n), None


gather_vmem.defvjp(_gather_vmem_fwd, _gather_vmem_bwd)


# ---- packed two-accumulator variant ----------------------------------------
# The v1 kernel above measures ~21 ms at bench shapes (vs XLA's 24 ms
# in-step): every row's aligned-tile RMW chains on the previous row's store.
# This variant packs two logical table rows per physical row ([N/2, 2*D], no
# lane padding waste for D=64 bf16 -> 6.4 MB), which lets TWO independent
# accumulators fit in VMEM; alternating rows between them halves the
# dependency chain. Final combine: acc0 + acc1, unpacked outside.

def _scatter2_kernel(ids_ref, g_ref, acc0_ref, acc1_ref, *, R):
    D2 = acc0_ref.shape[1]
    D = D2 // 2
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, D2), 0)
    lane_half = jax.lax.broadcasted_iota(jnp.int32, (8, D2), 1) // D
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc0_ref[...] = jnp.zeros_like(acc0_ref)
        acc1_ref[...] = jnp.zeros_like(acc1_ref)

    def body(r, _):
        base = pl.multiple_of(r * 8, 8)
        gtile = g_ref[pl.ds(base, 8), :]          # [8, D]
        gwide = jnp.concatenate([gtile, gtile], axis=1)  # [8, 2D]
        for s in range(8):
            idx = ids_ref[base + s]
            phys = idx // 2
            tbase = pl.multiple_of((phys // 8) * 8, 8)
            tsub = phys - tbase
            keep = jnp.where((sub_iota == s) & (lane_half == idx % 2),
                             gwide, 0)
            contrib = pltpu.roll(keep.astype(jnp.float32), shift=tsub - s,
                                 axis=0).astype(gtile.dtype)
            acc = acc0_ref if s % 2 == 0 else acc1_ref
            acc[pl.ds(tbase, 8), :] = acc[pl.ds(tbase, 8), :] + contrib
        return 0

    jax.lax.fori_loop(0, R // 8, body, 0, unroll=False)


def scatter_add_rows2(ids: jnp.ndarray, g: jnp.ndarray, n_rows: int,
                      block: int = 2048) -> jnp.ndarray:
    """Packed two-accumulator VMEM scatter-add; n_rows must be even."""
    M, D = g.shape
    Mp = -(-M // block) * block
    if Mp != M:
        ids = jnp.pad(ids, (0, Mp - M))
        g = jnp.pad(g, ((0, Mp - M), (0, 0)))
    kern = functools.partial(_scatter2_kernel, R=block)
    # packed rows must be 8-aligned or the boundary tile RMW runs out of
    # bounds; pad and slice
    np_half = -(-(n_rows // 2) // 8) * 8
    half = jax.ShapeDtypeStruct((np_half, 2 * D), g.dtype)
    acc0, acc1 = pl.pallas_call(
        kern,
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((np_half, 2 * D), lambda i: (0, 0)),
                   pl.BlockSpec((np_half, 2 * D), lambda i: (0, 0))],
        out_shape=[half, half],
        interpret=_INTERPRET,
    )(ids.astype(jnp.int32), g)
    return (acc0 + acc1)[:n_rows // 2].reshape(n_rows, D)
