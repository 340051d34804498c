"""Fused pointwise-FFN Pallas kernel: Dense(F) -> act -> Dense(D) with the
[T, F] inner activation living only in VMEM.

Why: in the SASRec bench step (B=32768, L=50, D=64, F=512) the FFN's inner
activation is ~1.7 GB in bf16. XLA fuses elementwise ops *into* each matmul
but cannot fuse across the two matmuls, so the forward writes + reads that
tensor through HBM, and autodiff stores it (or its pre-activation) again
for the backward. This kernel streams token blocks: each [TB, D] block
computes pre-act/act/[TB, F] entirely in VMEM and writes only the [TB, D]
output; the backward recomputes the inner activation from x (one extra
[TB,D]x[D,F] matmul — the step is memory-bound, FLOPs are cheap) and
accumulates dW1/dW2/db1/db2 across the sequential grid in resident VMEM
output blocks.

Reference behavior mirrored: unirec/model/modules.py:319-355 (FeedForward:
dense_1 -> act -> dense_2; dropout + residual LayerNorm stay outside, their
traffic is [T, D]-sized). Numerics match the XLA bf16 path: matmuls take
bf16 operands with f32 accumulation, the activation runs in f32.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirec_tpu.ops.common import mm_precision

_INTERPRET = False  # flipped by tests / the dryrun CPU fallback

_SQRT_2_OVER_PI = 0.7978845608028654


def _act_and_grad(pre, act: str):
    """Activation value and its derivative, in f32 (matches models.modules
    ACT2FN definitions)."""
    if act == "relu":
        return jnp.maximum(pre, 0.0), (pre > 0).astype(pre.dtype)
    if act == "swish":
        s = jax.nn.sigmoid(pre)
        return pre * s, s * (1.0 + pre * (1.0 - s))
    if act == "sigmoid":
        s = jax.nn.sigmoid(pre)
        return s, s * (1.0 - s)
    if act == "tanh":
        t = jnp.tanh(pre)
        return t, 1.0 - t * t
    if act == "gelu":
        # exact (erf) gelu — matches models.modules.ACT2FN's
        # approximate=False
        phi = 0.5 * (1.0 + jax.lax.erf(pre * (2.0 ** -0.5)))
        pdf = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
        return pre * phi, phi + pre * pdf
    if act == "leakyrelu":
        return jax.nn.leaky_relu(pre), jnp.where(pre > 0, 1.0, 0.01)
    raise ValueError(f"unsupported activation for fused ffn: {act}")


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act):
    prec = mm_precision(x_ref.dtype, w1_ref.dtype)
    pre = jnp.dot(x_ref[...], w1_ref[...], precision=prec,
                  preferred_element_type=jnp.float32) + b1_ref[...]
    h, _ = _act_and_grad(pre, act)
    y = jnp.dot(h.astype(w2_ref.dtype), w2_ref[...], precision=prec,
                preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w1_ref, w2_ref, b1_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, act):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dot = functools.partial(jax.lax.dot_general,
                            precision=mm_precision(x_ref.dtype,
                                                   w1_ref.dtype),
                            preferred_element_type=jnp.float32)
    x = x_ref[...]
    dyf = dy_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(x.dtype)
    pre = jnp.dot(x, w1_ref[...],
                  precision=mm_precision(x.dtype, w1_ref.dtype),
                  preferred_element_type=jnp.float32) + b1_ref[...]
    h, dact = _act_and_grad(pre, act)
    # all grad matmuls written as contractions — no in-kernel transposes
    dh = dot(dy, w2_ref[...], (((1,), (1,)), ((), ()))) * dact  # [TB, F]
    dh_c = dh.astype(x.dtype)
    dx_ref[...] = dot(dh_c, w1_ref[...],
                      (((1,), (1,)), ((), ()))).astype(dx_ref.dtype)
    dw1_ref[...] += dot(x, dh_c, (((0,), (0,)), ((), ())))      # [D, F]
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw2_ref[...] += dot(h.astype(x.dtype), dy,
                        (((0,), (0,)), ((), ())))               # [F, D]
    db2_ref[...] += jnp.sum(dyf, axis=0, keepdims=True)


def _pad_tokens(x, tb):
    t = x.shape[0]
    t_pad = -(-t // tb) * tb
    if t_pad != t:
        x = jnp.concatenate(
            [x, jnp.zeros((t_pad - t,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ffn(x, w1, b1, w2, b2, act: str = "swish", block: int = 1024,
              interpret: bool = False):
    """y = act(x @ w1 + b1) @ w2 + b2 with the [T, F] inner activation kept
    in VMEM. x: [T, D]; w1: [D, F]; w2: [F, D]. Differentiable w.r.t. all
    array args; backward recomputes the inner activation (no [T, F]
    residual is stored)."""
    return _fused_ffn_fwd(x, w1, b1, w2, b2, act, block, interpret)[0]


def _call_fwd(x, w1, b1, w2, b2, act, block, interpret):
    t = x.shape[0]
    d, f = w1.shape
    xp = _pad_tokens(x, block)
    grid = (xp.shape[0] // block,)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * d * f,
            bytes_accessed=2 * xp.size * x.dtype.itemsize,
            transcendentals=xp.shape[0] * f),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xp, w1, b1.reshape(1, f), w2, b2.reshape(1, d))
    return y[:t]


def _fused_ffn_fwd(x, w1, b1, w2, b2, act, block, interpret):
    return _call_fwd(x, w1, b1, w2, b2, act, block, interpret), \
        (x, w1, b1, w2, b2)


def _fused_ffn_bwd(act, block, interpret, res, dy):
    x, w1, b1, w2, b2 = res
    t = x.shape[0]
    d, f = w1.shape
    xp = _pad_tokens(x, block)
    dyp = _pad_tokens(dy, block)        # zero rows contribute nothing
    grid = (xp.shape[0] // block,)
    full = lambda i: (0, 0)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * xp.shape[0] * d * f,
            bytes_accessed=3 * xp.size * x.dtype.itemsize,
            transcendentals=xp.shape[0] * f),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, dyp, w1, w2, b1.reshape(1, f))
    return (dx[:t], dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2, act: str = "swish"):
    """XLA reference of the same computation (used by tests/benchmarks)."""
    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h, _ = _act_and_grad(pre, act)
    return (jnp.dot(h.astype(w2.dtype), w2,
                    preferred_element_type=jnp.float32)
            + b2).astype(x.dtype)
