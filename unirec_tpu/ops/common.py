"""Shared Pallas kernel helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mm_precision(*dtypes):
    """Matmul precision for in-kernel dots given the operand dtypes.

    Mosaic rejects sub-f32 dot operands under an ambient
    ``jax_default_matmul_precision='highest'`` ("Bad lhs type": highest
    requests multi-pass f32 emulation, which only exists for f32 inputs).
    The kernels' design point is native single-pass bf16 multiplies with
    f32 accumulation (``preferred_element_type``), so pin DEFAULT whenever
    any operand is sub-f32 and inherit the ambient setting for pure-f32
    dots (where 'highest' is both supported and what f32 tests want).
    """
    if any(jnp.dtype(d) != jnp.float32 for d in dtypes):
        return jax.lax.Precision.DEFAULT
    return None


def keep_mask(shape, p_drop: float):
    """Bernoulli(1 - p_drop) from the in-kernel PRNG, computed entirely in
    the signed-int32 domain: Mosaic has no uint32->f32 cast, and the raw
    bits are signed (a naive float conversion gave keep-rate 0.40 instead
    of 0.90 at p=0.1 — measured). bits is uniform over [-2^31, 2^31), so
    P(bits >= t) = 1 - p_drop at t = -2^31 + p_drop * 2^32."""
    from jax.experimental.pallas import tpu as pltpu
    bits = pltpu.prng_random_bits(shape)
    t = int(round(-(2 ** 31) + p_drop * 2 ** 32))
    t = min(max(t, -(2 ** 31)), 2 ** 31 - 1)
    return bits >= jnp.int32(t)
