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
