"""Whole-transformer-layer Pallas kernel (round-4 measured lever).

Why this exists: the bench step is HBM-bandwidth-bound (81% utilization,
docs/performance_notes.md) and the remaining full-length layer's attention
core plus its layout copies are the largest op group after the round-3
levers (~30 + ~8 ms of the 124.7 ms step). The round-2 attention-only
kernel lost to XLA for a *measured* reason: its (B/8)×H grid issued 8192
programs of ~28 KB DMAs — per-program overhead, not bandwidth. The fix its
postmortem prescribed (`ops/attention.py:250-256`) is exactly this kernel:
coarser blocking and wider fusion.

One program handles a block of MB examples for the ENTIRE post-LN layer
(reference math: unirec/model/modules.py:247-355):

    qkv proj → per-head scores → +mask → softmax → dropout → @V →
    out proj → dropout → +residual → LN → FFN(dense→act→dense) →
    dropout → +residual → LN

HBM traffic becomes x in, y out (+ small weights), instead of the XLA
path's many materialized [B, H, L, L] and [B, L, D] intermediates. The
backward kernel recomputes everything from x in VMEM (flash-style; the
only residual saved between fwd and bwd is x itself) and emits per-program
PARTIAL weight grads that are densely summed outside — this sidesteps the
sequential-grid accumulation that made the fused-FFN backward lose
(modules.py FeedForward docstring).

Dropout runs on the in-kernel PRNG with a distinct reseed per dropout site
(attn-head h / attn-out / ffn-out), so the backward replays each site's
mask exactly without storing it, in any order. Like the other dropout
levers (rbg, bits8) the draw differs from the flax stream: trajectories
change bit-wise, distributions do not — opt-in, A/B'd on final loss.

Masking: takes the key-padding additive row `madd [B, L]` (== row L-1 of
the reference's [B, 1, L, L] additive mask, which encodes key padding
only) and rebuilds the causal triangle in-kernel, reproducing
modules.causal_attention_mask exactly for both causal and bidirectional.

Numerics: matmuls run in the input dtype (bf16 under compute_dtype) with
f32 accumulation; softmax and both LayerNorms compute in f32 (the XLA
bf16 path does softmax/LN in bf16 — eval outputs agree to bf16 tolerance,
asserted in tests/test_kernels.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirec_tpu.ops.common import mm_precision


def _dot(a, b):
    """In-kernel matmul: f32 accumulation; precision pinned per operand
    dtype (ops/common.py::mm_precision — ambient 'highest' would be a
    Mosaic compile error for bf16 operands)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=mm_precision(a.dtype, b.dtype))

MASK_VALUE = -1e4  # reference additive mask (sasrec.py:56)

_INTERPRET = False  # flipped by tests on CPU
# r5 experiment: block-diagonal two-head packing of the attention matmuls
# (see _attention_heads). Opt-in via env for the A/B; numerics identical.
_PACKED_HEADS = bool(int(os.environ.get("UNIREC_PACKED_HEADS", "0") or 0))


# --------------------------------------------------------------- activations
def _act_pair(name: str):
    """(f, df) in f32 — closed-form derivative so the backward kernel can
    recompute act'(u) without autodiff."""
    if name == "relu":
        return (lambda u: jnp.maximum(u, 0.0),
                lambda u: (u > 0.0).astype(u.dtype))
    if name == "swish":
        def f(u):
            return u * jax.nn.sigmoid(u)

        def df(u):
            s = jax.nn.sigmoid(u)
            return s * (1.0 + u * (1.0 - s))
        return f, df
    if name == "gelu":  # erf form, matching ACT2FN's approximate=False.
        # Mosaic has no erf lowering; Abramowitz & Stegun 7.1.26 polynomial
        # (|error| <= 1.5e-7 — below f32 rounding at these magnitudes)
        def _erf(z):
            s = jnp.sign(z)
            za = jnp.abs(z)
            t = 1.0 / (1.0 + 0.3275911 * za)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            return s * (1.0 - poly * jnp.exp(-za * za))

        def f(u):
            return 0.5 * u * (1.0 + _erf(u * (1.0 / np.sqrt(2.0))))

        def df(u):
            cdf = 0.5 * (1.0 + _erf(u * (1.0 / np.sqrt(2.0))))
            pdf = jnp.exp(-0.5 * u * u) * (1.0 / np.sqrt(2.0 * np.pi))
            return cdf + u * pdf
        return f, df
    if name == "tanh":
        return jnp.tanh, lambda u: 1.0 - jnp.tanh(u) ** 2
    if name == "sigmoid":
        def df(u):
            s = jax.nn.sigmoid(u)
            return s * (1.0 - s)
        return jax.nn.sigmoid, df
    raise ValueError(f"unsupported activation for fused layer: {name}")


SUPPORTED_ACTS = ("relu", "swish", "gelu", "tanh", "sigmoid")


# ------------------------------------------------------------------- dropout
# Masks are drawn at a CANONICAL granularity of SUB=8 examples, seeded by
# the GLOBAL sub-block index (program_id * n_sub + j) — NOT by program id
# alone. The forward and backward kernels launch with different block
# sizes (UNIREC_LAYER_MB=64 vs UNIREC_LAYER_MB_BWD=16), so a per-program
# seed would regenerate DIFFERENT masks in the backward than the forward
# applied (silently wrong dropout gradients at any B >= 2 blocks; caught
# by tests/test_kernels.py::test_fused_layer_dropout_grads_across_grids).
# With the global-sub-block scheme the mask for example i depends only on
# (seed, site, i // 8), identical under every legal grid: _block_rows
# guarantees blocks are multiples of 8 examples, or the whole batch on
# BOTH sides when B itself is not (n_sub falls back to 1 consistently).
SUB = 8


from unirec_tpu.ops.common import keep_mask as _keep_mask  # shared derivation


def _keep_canonical(seed_ref, site: int, mb: int, shape, p: float):
    """Keep-mask of ``shape`` (axis 0 = mb * rows_per_example) assembled
    from SUB-example sub-draws with grid-independent seeds."""
    n_sub = mb // SUB if mb % SUB == 0 else 1
    step = shape[0] // n_sub
    parts = []
    for j in range(n_sub):
        g = pl.program_id(0) * n_sub + j
        pltpu.prng_seed(seed_ref[0] + g * 7919 + site * 613)
        parts.append(_keep_mask((step,) + tuple(shape[1:]), p))
    return parts[0] if n_sub == 1 else jnp.concatenate(parts, axis=0)


def _dropped(x, seed_ref, site: int, p: float, mb: int):
    """Dropout over a block holding ``mb`` examples on (a multiple of)
    axis 0 — [mb*L, D] activations and [mb, ...] rows both qualify."""
    if p <= 0.0:
        return x
    keep = _keep_canonical(seed_ref, site, mb, x.shape, p)
    return jnp.where(keep, x * (1.0 / (1.0 - p)), jnp.zeros_like(x))


# ----------------------------------------------------------------- layernorm
def _ln_fwd(r, g, b, eps):
    """f32 LayerNorm over the last dim. r [T, D] f32; g/b [1, D]."""
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * rs
    return xhat * g + b, xhat, rs


def _ln_bwd(dy, xhat, rs, g):
    """Given upstream dy [T, D] and saved (xhat, rs): returns (dr, dg, db)."""
    dxh = dy * g
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dr = rs * (dxh - m1 - xhat * m2)
    return dr, jnp.sum(dy * xhat, axis=0, keepdims=True), \
        jnp.sum(dy, axis=0, keepdims=True)


# --------------------------------------------------------------- shared math
def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-dim) matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=mm_precision(a.dtype, b.dtype))


def _attention_heads(x2, madd, wqkv, bqkv, seed_ref, *, mb, L, nh, hd,
                     p_attn, causal, train, save=False):
    """qkv projection + per-head masked softmax(+dropout) @ V.

    Returns ctx [T, D] (input dtype) and, when ``save``, the per-head
    recompute bundle the backward needs (q, k, v, PRE-dropout probs f32).

    Heads are sliced from the 2-D qkv matrix (head h of q is columns
    h*hd:(h+1)*hd) — a [mb, L, nh, hd] reshape would put (nh, hd) on the
    tile dims and pad 16x at nh=2, hd=32.
    """
    D = nh * hd
    dt = x2.dtype
    qkv = (_dot(x2, wqkv)
           .astype(dt) + bqkv)
    scale = 1.0 / float(np.sqrt(hd))
    # additive mask [MB, L, L] in f32: key-pad row broadcast over queries,
    # causal triangle rebuilt in-kernel. elementwise MINIMUM reproduces the
    # reference's (1 - pad*causal)*-1e4 exactly (never -2e4 when both
    # forbidden — a fully-masked row must stay uniform) while preserving
    # the hard -1e30 ban on Lp-padding fake keys.
    mrow = madd.astype(jnp.float32)[:, None, :]  # [MB, 1, L]
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        tri = jnp.where(kj > qi, jnp.float32(MASK_VALUE), 0.0)[None]
        mfull = jnp.minimum(mrow, tri)
    else:
        mfull = jnp.broadcast_to(mrow, (mb, L, L))
    if nh == 2 and _PACKED_HEADS:
        # Block-diagonal head packing (r5 experiment): both heads' scores
        # in ONE batched matmul per block — S2 = q_all @ K2^T with K2
        # [2L, D] holding head h's keys in rows h*L:(h+1)*L, lanes
        # h*hd:(h+1)*hd (cross blocks hit zeros). Halves MXU tile passes
        # (each per-head [L, hd]@[hd, L] pass used 1/16 of a 128^3 tile);
        # ctx likewise via a zero-padded V2 whose output lands already
        # head-concatenated. Softmax/dropout are per-half so numerics ==
        # the unpacked loop (same _keep_canonical bits per head).
        q_all = qkv[:, :D].reshape(mb, L, D)
        k_all = qkv[:, D:2 * D].reshape(mb, L, D)
        v_all = qkv[:, 2 * D:].reshape(mb, L, D)
        lane = jax.lax.broadcasted_iota(jnp.int32, (mb, L, D), 2)
        K2 = jnp.concatenate([jnp.where(lane < hd, k_all, 0),
                              jnp.where(lane >= hd, k_all, 0)], axis=1)
        V2 = jnp.concatenate([jnp.where(lane < hd, v_all, 0),
                              jnp.where(lane >= hd, v_all, 0)], axis=1)
        s2 = _bdot(q_all, K2, 2, 2) * scale              # [MB, L, 2L] f32
        s2 = s2 + jnp.concatenate([mfull, mfull], axis=-1)
        halves = []
        for h in range(2):
            sh = s2[:, :, h * L:(h + 1) * L]
            sh = sh - jnp.max(sh, axis=-1, keepdims=True)
            ph = jnp.exp(sh)
            halves.append(ph / jnp.sum(ph, axis=-1, keepdims=True))
        bundle = []
        if save:
            for h in range(2):
                bundle.append((qkv[:, h * hd:(h + 1) * hd].reshape(mb, L, hd),
                               qkv[:, D + h * hd:D + (h + 1) * hd].reshape(mb, L, hd),
                               qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd].reshape(mb, L, hd),
                               halves[h]))
        if train and p_attn > 0.0:
            inv = 1.0 / (1.0 - p_attn)
            halves = [jnp.where(_keep_canonical(seed_ref, h, mb,
                                                halves[h].shape, p_attn),
                                halves[h] * inv, 0.0) for h in range(2)]
        p2 = jnp.concatenate(halves, axis=-1)            # [MB, L, 2L]
        ctx = _bdot(p2.astype(dt), V2, 2, 1)             # [MB, L, D]
        return qkv, ctx.astype(dt).reshape(mb * L, D), bundle

    ctx_heads, bundle = [], []
    for h in range(nh):
        qh = qkv[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        kh = qkv[:, D + h * hd:D + (h + 1) * hd].reshape(mb, L, hd)
        vh = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd].reshape(mb, L, hd)
        s = _bdot(qh, kh, 2, 2) * scale + mfull          # [MB, L, L] f32
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if save:
            bundle.append((qh, kh, vh, p))               # pre-dropout probs
        if train and p_attn > 0.0:
            keep = _keep_canonical(seed_ref, h, mb, p.shape, p_attn)
            p = jnp.where(keep, p * (1.0 / (1.0 - p_attn)), 0.0)
        ch = _bdot(p.astype(dt), vh, 2, 1)               # [MB, L, hd] f32
        ctx_heads.append(ch.astype(dt).reshape(mb * L, hd))
    ctx = jnp.concatenate(ctx_heads, axis=-1)
    return qkv, ctx, bundle


# ------------------------------------------------------------ forward kernel
def _layer_fwd_kernel(x_ref, madd_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                      g1_ref, c1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      g2_ref, c2b_ref, seed_ref, y_ref,
                      *, nh, hd, F, p_attn, p_hidden, act, eps, causal,
                      train):
    mb, L, D = x_ref.shape
    dt = x_ref.dtype
    act_f, _ = _act_pair(act)
    x2 = x_ref[...].reshape(mb * L, D)
    _, ctx, _ = _attention_heads(
        x2, madd_ref[...], wqkv_ref[...], bqkv_ref[...], seed_ref,
        mb=mb, L=L, nh=nh, hd=hd, p_attn=p_attn, causal=causal, train=train)
    o = (_dot(ctx, wo_ref[...])
         .astype(dt) + bo_ref[...])
    if train:
        o = _dropped(o, seed_ref, nh, p_hidden, mb)
    r1 = (o + x2).astype(jnp.float32)
    x1f, _, _ = _ln_fwd(r1, g1_ref[...], c1b_ref[...], eps)
    x1 = x1f.astype(dt)
    u = (_dot(x1, w1_ref[...])
         .astype(dt) + b1_ref[...])
    hm = act_f(u.astype(jnp.float32)).astype(dt)
    h2 = (_dot(hm, w2_ref[...])
          .astype(dt) + b2_ref[...])
    if train:
        h2 = _dropped(h2, seed_ref, nh + 1, p_hidden, mb)
    r2 = (h2 + x1).astype(jnp.float32)
    yf, _, _ = _ln_fwd(r2, g2_ref[...], c2b_ref[...], eps)
    y_ref[...] = yf.astype(dt).reshape(mb, L, D)


# ----------------------------------------------------------- backward kernel
def _layer_bwd_kernel(x_ref, madd_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                      g1_ref, c1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      g2_ref, c2b_ref, seed_ref, dy_ref,
                      dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                      dg1_ref, dc1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dg2_ref, dc2b_ref,
                      *, nh, hd, F, p_attn, p_hidden, act, eps, causal,
                      train):
    mb, L, D = x_ref.shape
    dt = x_ref.dtype
    act_f, act_df = _act_pair(act)
    scale = 1.0 / float(np.sqrt(hd))
    inv_h = 1.0 / (1.0 - p_hidden) if p_hidden > 0.0 else 1.0
    inv_a = 1.0 / (1.0 - p_attn) if p_attn > 0.0 else 1.0

    # ---- recompute forward, saving what the backward needs
    x2 = x_ref[...].reshape(mb * L, D)
    qkv, ctx, heads = _attention_heads(
        x2, madd_ref[...], wqkv_ref[...], bqkv_ref[...], seed_ref,
        mb=mb, L=L, nh=nh, hd=hd, p_attn=p_attn, causal=causal,
        train=train, save=True)
    o = (_dot(ctx, wo_ref[...])
         .astype(dt) + bo_ref[...])
    if train and p_hidden > 0.0:
        keep_o = _keep_canonical(seed_ref, nh, mb, o.shape, p_hidden)
        od = jnp.where(keep_o, o * inv_h, jnp.zeros_like(o))
    else:
        od = o
    r1 = (od + x2).astype(jnp.float32)
    x1f, xhat1, rs1 = _ln_fwd(r1, g1_ref[...], c1b_ref[...], eps)
    x1 = x1f.astype(dt)
    u = (_dot(x1, w1_ref[...])
         .astype(dt) + b1_ref[...])
    uf = u.astype(jnp.float32)
    hm = act_f(uf).astype(dt)
    h2 = (_dot(hm, w2_ref[...])
          .astype(dt) + b2_ref[...])
    if train and p_hidden > 0.0:
        keep_2 = _keep_canonical(seed_ref, nh + 1, mb, h2.shape, p_hidden)
        h2d = jnp.where(keep_2, h2 * inv_h, jnp.zeros_like(h2))
    else:
        h2d = h2
    r2 = (h2d + x1).astype(jnp.float32)
    _, xhat2, rs2 = _ln_fwd(r2, g2_ref[...], c2b_ref[...], eps)

    # ---- backward
    dy = dy_ref[...].reshape(mb * L, D).astype(jnp.float32)
    dr2, dg2, db2 = _ln_bwd(dy, xhat2, rs2, g2_ref[...])
    dg2_ref[...] = dg2
    dc2b_ref[...] = db2
    dh2 = dr2
    if train and p_hidden > 0.0:
        dh2 = jnp.where(keep_2, dh2 * inv_h, 0.0)
    dh2 = dh2.astype(dt)
    dw2_ref[...] = _dot(hm.T, dh2)
    db2_ref[...] = jnp.sum(dh2.astype(jnp.float32), axis=0, keepdims=True)
    dhm = _dot(dh2, w2_ref[...].T)
    du = (dhm * act_df(uf)).astype(dt)
    dw1_ref[...] = _dot(x1.T, du)
    db1_ref[...] = jnp.sum(du.astype(jnp.float32), axis=0, keepdims=True)
    dx1 = dr2 + _dot(du, w1_ref[...].T)
    dr1, dg1, db1 = _ln_bwd(dx1, xhat1, rs1, g1_ref[...])
    dg1_ref[...] = dg1
    dc1b_ref[...] = db1
    do = dr1
    if train and p_hidden > 0.0:
        do = jnp.where(keep_o, do * inv_h, 0.0)
    do = do.astype(dt)
    dwo_ref[...] = _dot(ctx.T, do)
    dbo_ref[...] = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dctx = _dot(do, wo_ref[...].T).astype(dt)
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(nh):
        qh, kh, vh, p = heads[h]                            # p: PRE-dropout
        dch = dctx[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        if train and p_attn > 0.0:
            keep = _keep_canonical(seed_ref, h, mb, p.shape, p_attn)  # same mask as fwd
            pz = jnp.where(keep, p * inv_a, 0.0)            # post-dropout
        else:
            keep, pz = None, p
        dv_parts.append(_bdot(pz.astype(dt), dch, 1, 1))    # [MB, L, hd]
        dpz = _bdot(dch, vh, 2, 2)                          # [MB, L, L] f32
        dp = jnp.where(keep, dpz * inv_a, 0.0) if keep is not None else dpz
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - t) * scale).astype(dt)
        dq_parts.append(_bdot(ds, kh, 2, 1))
        dk_parts.append(_bdot(ds, qh, 1, 1))
    def stack_heads(parts):
        return jnp.concatenate(
            [pp.astype(dt).reshape(mb * L, hd) for pp in parts], axis=-1)
    dqkv = jnp.concatenate([stack_heads(dq_parts), stack_heads(dk_parts),
                            stack_heads(dv_parts)], axis=-1)
    dwqkv_ref[...] = _dot(x2.T, dqkv)
    dbqkv_ref[...] = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dx = dr1 + _dot(dqkv, wqkv_ref[...].T)
    dx_ref[...] = dx.astype(dt).reshape(mb, L, D)


# ------------------------------------------------------------------ wrappers
def _block_rows(B: int, env: str, default: int) -> int:
    """Largest power-of-two block <= default that divides B — constrained to
    Mosaic's rule that a block's second-to-last dim must be a multiple of 8
    or equal the array dim (the [mb, Lp] madd spec): odd/small batches fall
    back to one full-batch program."""
    mb = int(os.environ.get(env) or default)
    while mb > 8 and B % mb:
        mb //= 2
    if B % mb or (mb % 8 and mb != B):
        return B
    return max(mb, 1)


# Calibrated scoped-VMEM budgets, in footprint ELEMENTS
# mb * Lp * (Lp + 2*(D + F)): the quadratic term models the per-head
# score/prob (+ backward recompute) arrays, the linear term the x/qkv/ffn
# blocks. Caps sit between Mosaic-compile-measured OK/FAIL boundary points
# on a real TPU at D=64, F=256 (r5 probe):
#   fwd : OK (mb=64,Lp=56) 2.49M, (32,128) 3.15M, (8,256) 1.83M;
#         FAIL (128,56) 4.99M, (64,128) 6.29M          -> cap 3.2M
#   bwd : OK (16,56) 0.62M, (8,128) 0.79M;
#         FAIL (32,56) 1.25M, (16,128) 1.57M, (8,256) 1.83M -> cap 0.8M
_FWD_CAP = 3_200_000
_BWD_CAP = 800_000


def _footprint(mb: int, Lp: int, D: int, F: int) -> int:
    return mb * Lp * (Lp + 2 * (D + F))


def _fit_mb(B: int, Lp: int, D: int, F: int, env: str, default: int,
            cap: int) -> int:
    """Largest legal block whose footprint fits the calibrated scoped-VMEM
    budget; 0 when nothing legal fits (fused_layer_supported applies the
    same rule, so the pallas_call wrappers never see 0). An explicit
    UNIREC_LAYER_MB* env override is trusted as user-measured and bypasses
    the cap."""
    if os.environ.get(env):
        return _block_rows(B, env, default)
    mb = _block_rows(B, env, default)
    while _footprint(mb, Lp, D, F) > cap:
        half = mb // 2
        if half < 8 or B % half or half % 8:
            break
        mb = half
    if _footprint(mb, Lp, D, F) > cap:
        return 0
    return mb


def _pad_L(x, madd, L):
    """Pad the sequence dim to a sublane multiple; padded keys are forbidden
    with a hard -1e30 (probability exactly 0 — the reference's soft -1e4
    lets fully-masked rows attend uniformly over REAL keys only)."""
    Lp = -(-L // 8) * 8
    if Lp == L:
        return x, madd, L
    x = jnp.pad(x, [(0, 0), (0, Lp - L), (0, 0)])
    madd = jnp.pad(madd, [(0, 0), (0, Lp - L)], constant_values=-1e30)
    return x, madd, Lp


def _specs(B, Lp, D, F, mb):
    xs = pl.BlockSpec((mb, Lp, D), lambda i: (i, 0, 0))
    ms = pl.BlockSpec((mb, Lp), lambda i: (i, 0))
    full2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    w_specs = [full2(D, 3 * D), full2(1, 3 * D), full2(D, D), full2(1, D),
               full2(1, D), full2(1, D), full2(D, F), full2(1, F),
               full2(F, D), full2(1, D), full2(1, D), full2(1, D)]
    return xs, ms, w_specs, seed


def _weights_tuple(params, dt):
    """(wqkv, bqkv, wo, bo, g1, b1, w1, c1, w2, c2, g2, b2) in compute/f32."""
    (wq, bq), (wk, bk), (wv, bv), (wo, bo), (g1, c1), \
        (w1, b1), (w2, b2), (g2, c2) = params
    wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
    bqkv = jnp.concatenate([bq, bk, bv])[None].astype(dt)
    return (wqkv, bqkv, wo.astype(dt), bo[None].astype(dt),
            g1[None].astype(jnp.float32), c1[None].astype(jnp.float32),
            w1.astype(dt), b1[None].astype(dt),
            w2.astype(dt), b2[None].astype(dt),
            g2[None].astype(jnp.float32), c2[None].astype(jnp.float32))


# static (arg 3) is a hashable tuple; seed stays a traced operand whose
# cotangent is None (same pattern as ops/attention.py::fused_attention)
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_layer(x, madd, flat_weights, static, seed):
    y, _ = _fused_layer_fwd_impl(x, madd, flat_weights, static, seed)
    return y


def _fused_layer_fwd_impl(x, madd, flat_weights, static, seed):
    nh, hd, F, p_attn, p_hidden, act, eps, causal, train = static
    B, L, D = x.shape
    xp, mp, Lp = _pad_L(x, madd, L)
    # MB=128 at bench shapes (L=50->56, D=64) peaks ~19 MB of VMEM (>16 MB
    # scoped limit, measured on v5e); 64 fits with headroom. Longer L
    # shrinks the block to hold mb*Lp^2 at the calibrated budget.
    mb = _fit_mb(B, Lp, D, F, "UNIREC_LAYER_MB", 64, _FWD_CAP)
    xs, ms, w_specs, seed_spec = _specs(B, Lp, D, F, mb)
    kern = functools.partial(
        _layer_fwd_kernel, nh=nh, hd=hd, F=F, p_attn=p_attn,
        p_hidden=p_hidden, act=act, eps=eps, causal=causal, train=train)
    y = pl.pallas_call(
        kern,
        grid=(B // mb,),
        in_specs=[xs, ms] + w_specs + [seed_spec],
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((B, Lp, D), x.dtype),
        interpret=_INTERPRET,
    )(xp, mp, *flat_weights, seed)
    return y[:, :L, :], (x, madd, flat_weights, seed)


def _fused_layer_fwd(x, madd, flat_weights, static, seed):
    return _fused_layer_fwd_impl(x, madd, flat_weights, static, seed)


def _fused_layer_bwd(static, res, g):
    nh, hd, F, p_attn, p_hidden, act, eps, causal, train = static
    x, madd, flat_weights, seed = res
    B, L, D = x.shape
    xp, mp, Lp = _pad_L(x, madd, L)
    gp = jnp.pad(g, [(0, 0), (0, Lp - L), (0, 0)]) if Lp != L else g
    # backward holds the full per-head recompute bundle live; 32 peaks
    # ~19.4 MB of scoped VMEM at bench shapes (>16 MB limit, v5e) — 16 fits
    # and measured 112 ms vs the 124.9 ms unfused baseline
    mb = _fit_mb(B, Lp, D, F, "UNIREC_LAYER_MB_BWD", 16, _BWD_CAP)
    n_prog = B // mb
    xs, ms, w_specs, seed_spec = _specs(B, Lp, D, F, mb)
    kern = functools.partial(
        _layer_bwd_kernel, nh=nh, hd=hd, F=F, p_attn=p_attn,
        p_hidden=p_hidden, act=act, eps=eps, causal=causal, train=train)

    def partial_spec(r, c):
        # one [r, c] slab per program, densely summed outside — keeps the
        # grid parallel (no cross-program accumulation)
        return (pl.BlockSpec((None, r, c), lambda i: (i, 0, 0)),
                jax.ShapeDtypeStruct((n_prog, r, c), jnp.float32))

    grad_sp = [partial_spec(D, 3 * D), partial_spec(1, 3 * D),
               partial_spec(D, D), partial_spec(1, D),
               partial_spec(1, D), partial_spec(1, D),
               partial_spec(D, F), partial_spec(1, F),
               partial_spec(F, D), partial_spec(1, D),
               partial_spec(1, D), partial_spec(1, D)]
    outs = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[xs, ms] + w_specs + [seed_spec, xs],
        out_specs=[xs] + [s for s, _ in grad_sp],
        out_shape=[jax.ShapeDtypeStruct((B, Lp, D), x.dtype)]
                  + [sh for _, sh in grad_sp],
        interpret=_INTERPRET,
    )(xp, mp, *flat_weights, seed, gp)
    dx = outs[0][:, :L, :]
    dws = [o.sum(axis=0) for o in outs[1:]]
    # unflatten to the flat_weights structure (cast back to each leaf dtype)
    dflat = tuple(dw.reshape(w.shape).astype(w.dtype)
                  for dw, w in zip(dws, flat_weights))
    return dx, None, dflat, None


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


# ------------------------------------------------- last-query layer kernel
# The final encoder layer under `last_query_only` consumes ONLY query
# position L-1 (sasrec.py:59-76; left-padded windows). The unfused lastq
# path still materializes full-length K/V projections plus their
# [B, nh, L, hd] transposes in HBM; this kernel keeps them in VMEM. One
# program per MB-example block computes k/v for all rows, q for the last
# real row, single-row attention, out-proj, and the FFN — emitting [MB, D].
# Backward recomputes from x (same recipe as the whole-layer kernel) and
# writes per-program partial weight slabs.

def _lastq_fwd_kernel(x_ref, madd_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, wo_ref, bo_ref, g1_ref, c1b_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, c2b_ref,
                      seed_ref, y_ref,
                      *, qi, nh, hd, F, p_attn, p_hidden, act, eps, train):
    mb, L, D = x_ref.shape
    dt = x_ref.dtype
    act_f, _ = _act_pair(act)
    x2 = x_ref[...].reshape(mb * L, D)
    xq = x_ref[:, qi:qi + 1, :].reshape(x_ref.shape[0], x_ref.shape[2])                                   # [mb, D]
    k = (_dot(x2, wk_ref[...]).astype(dt) + bk_ref[...])
    v = (_dot(x2, wv_ref[...]).astype(dt) + bv_ref[...])
    q = (_dot(xq, wq_ref[...]).astype(dt) + bq_ref[...])   # [mb, D]
    scale = 1.0 / float(np.sqrt(hd))
    mrow = madd_ref[...].astype(jnp.float32)[:, None, :]   # [mb, 1, L]
    ctx_heads = []
    for h in range(nh):
        kh = k[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        vh = v[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        # size-1 middle-dim insert must happen in f32: Mosaic rejects the
        # bf16 (2,1)-packed shape cast [mb,hd]->[mb,1,hd]
        qh = (q[:, h * hd:(h + 1) * hd].astype(jnp.float32)
              [:, None, :].astype(dt))
        s = _bdot(qh, kh, 2, 2) * scale + mrow             # [mb, 1, L] f32
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if train and p_attn > 0.0:
            keep = _keep_canonical(seed_ref, h, mb, p.shape, p_attn)
            p = jnp.where(keep, p * (1.0 / (1.0 - p_attn)), 0.0)
        ch = _bdot(p.astype(dt), vh, 2, 1)                 # [mb, 1, hd] f32
        ctx_heads.append(ch.reshape(mb, hd).astype(dt))
    ctx = jnp.concatenate(ctx_heads, axis=-1)              # [mb, D]
    o = (_dot(ctx, wo_ref[...]).astype(dt) + bo_ref[...])
    if train:
        o = _dropped(o, seed_ref, nh, p_hidden, mb)
    r1 = (o + xq).astype(jnp.float32)
    x1f, _, _ = _ln_fwd(r1, g1_ref[...], c1b_ref[...], eps)
    x1 = x1f.astype(dt)
    u = (_dot(x1, w1_ref[...]).astype(dt) + b1_ref[...])
    hm = act_f(u.astype(jnp.float32)).astype(dt)
    h2 = (_dot(hm, w2_ref[...]).astype(dt) + b2_ref[...])
    if train:
        h2 = _dropped(h2, seed_ref, nh + 1, p_hidden, mb)
    r2 = (h2 + x1).astype(jnp.float32)
    yf, _, _ = _ln_fwd(r2, g2_ref[...], c2b_ref[...], eps)
    y_ref[...] = yf.astype(dt)


def _lastq_bwd_kernel(x_ref, madd_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, wo_ref, bo_ref, g1_ref, c1b_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, c2b_ref,
                      seed_ref, dy_ref,
                      dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                      dwv_ref, dbv_ref, dwo_ref, dbo_ref, dg1_ref, dc1b_ref,
                      dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref, dc2b_ref,
                      *, qi, nh, hd, F, p_attn, p_hidden, act, eps, train):
    mb, L, D = x_ref.shape
    dt = x_ref.dtype
    act_f, act_df = _act_pair(act)
    scale = 1.0 / float(np.sqrt(hd))
    inv_h = 1.0 / (1.0 - p_hidden) if p_hidden > 0.0 else 1.0
    inv_a = 1.0 / (1.0 - p_attn) if p_attn > 0.0 else 1.0

    # ---- recompute forward
    x2 = x_ref[...].reshape(mb * L, D)
    xq = x_ref[:, qi:qi + 1, :].reshape(x_ref.shape[0], x_ref.shape[2])
    k = (_dot(x2, wk_ref[...]).astype(dt) + bk_ref[...])
    v = (_dot(x2, wv_ref[...]).astype(dt) + bv_ref[...])
    q = (_dot(xq, wq_ref[...]).astype(dt) + bq_ref[...])
    mrow = madd_ref[...].astype(jnp.float32)[:, None, :]
    heads, ctx_heads = [], []
    for h in range(nh):
        kh = k[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        vh = v[:, h * hd:(h + 1) * hd].reshape(mb, L, hd)
        # size-1 middle-dim insert must happen in f32: Mosaic rejects the
        # bf16 (2,1)-packed shape cast [mb,hd]->[mb,1,hd]
        qh = (q[:, h * hd:(h + 1) * hd].astype(jnp.float32)
              [:, None, :].astype(dt))
        s = _bdot(qh, kh, 2, 2) * scale + mrow
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)         # pre-dropout
        heads.append((qh, kh, vh, p))
        if train and p_attn > 0.0:
            keep = _keep_canonical(seed_ref, h, mb, p.shape, p_attn)
            pz = jnp.where(keep, p * inv_a, 0.0)
        else:
            pz = p
        ch = _bdot(pz.astype(dt), vh, 2, 1)                # [mb, 1, hd] f32
        ctx_heads.append(ch.reshape(mb, hd).astype(dt))
    ctx = jnp.concatenate(ctx_heads, axis=-1)
    o = (_dot(ctx, wo_ref[...]).astype(dt) + bo_ref[...])
    if train and p_hidden > 0.0:
        keep_o = _keep_canonical(seed_ref, nh, mb, o.shape, p_hidden)
        od = jnp.where(keep_o, o * inv_h, jnp.zeros_like(o))
    else:
        od = o
    r1 = (od + xq).astype(jnp.float32)
    x1f, xhat1, rs1 = _ln_fwd(r1, g1_ref[...], c1b_ref[...], eps)
    x1 = x1f.astype(dt)
    u = (_dot(x1, w1_ref[...]).astype(dt) + b1_ref[...])
    uf = u.astype(jnp.float32)
    hm = act_f(uf).astype(dt)
    h2 = (_dot(hm, w2_ref[...]).astype(dt) + b2_ref[...])
    if train and p_hidden > 0.0:
        keep_2 = _keep_canonical(seed_ref, nh + 1, mb, h2.shape, p_hidden)
        h2d = jnp.where(keep_2, h2 * inv_h, jnp.zeros_like(h2))
    else:
        h2d = h2
    r2 = (h2d + x1).astype(jnp.float32)
    _, xhat2, rs2 = _ln_fwd(r2, g2_ref[...], c2b_ref[...], eps)

    # ---- backward
    dy = dy_ref[...].astype(jnp.float32)                   # [mb, D]
    dr2, dg2, db2 = _ln_bwd(dy, xhat2, rs2, g2_ref[...])
    dg2_ref[...] = dg2
    dc2b_ref[...] = db2
    dh2 = dr2
    if train and p_hidden > 0.0:
        dh2 = jnp.where(keep_2, dh2 * inv_h, 0.0)
    dh2 = dh2.astype(dt)
    dw2_ref[...] = _dot(hm.T, dh2)
    db2_ref[...] = jnp.sum(dh2.astype(jnp.float32), axis=0, keepdims=True)
    dhm = _dot(dh2, w2_ref[...].T)
    du = (dhm * act_df(uf)).astype(dt)
    dw1_ref[...] = _dot(x1.T, du)
    db1_ref[...] = jnp.sum(du.astype(jnp.float32), axis=0, keepdims=True)
    dx1 = dr2 + _dot(du, w1_ref[...].T)
    dr1, dg1, db1 = _ln_bwd(dx1, xhat1, rs1, g1_ref[...])
    dg1_ref[...] = dg1
    dc1b_ref[...] = db1
    do = dr1
    if train and p_hidden > 0.0:
        do = jnp.where(keep_o, do * inv_h, 0.0)
    do = do.astype(dt)
    dwo_ref[...] = _dot(ctx.T, do)
    dbo_ref[...] = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dctx = _dot(do, wo_ref[...].T).astype(dt)
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(nh):
        qh, kh, vh, p = heads[h]
        dch = (dctx[:, h * hd:(h + 1) * hd].astype(jnp.float32)
               [:, None, :].astype(dt))
        if train and p_attn > 0.0:
            keep = _keep_canonical(seed_ref, h, mb, p.shape, p_attn)
            pz = jnp.where(keep, p * inv_a, 0.0)
        else:
            keep, pz = None, p
        # dV_h [mb, L, hd] = pz^T (x) dch — rank-1 batched matmul
        # (contract the size-1 query dim; a reshape-based outer product
        # would move L between lane/sublane dims, a Mosaic relayout)
        dv_parts.append(_bdot(pz.astype(dt), dch, 1, 1))
        dpz = _bdot(dch, vh, 2, 2)                         # [mb, 1, L] f32
        dp = jnp.where(keep, dpz * inv_a, 0.0) if keep is not None else dpz
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - t) * scale).astype(dt)             # [mb, 1, L]
        dq_parts.append(_bdot(ds, kh, 2, 1).reshape(mb, hd).astype(dt))
        # dK_h [mb, L, hd] = ds^T (x) qh — same rank-1 batched matmul
        dk_parts.append(_bdot(ds, qh.astype(dt), 1, 1))
    dq = jnp.concatenate(dq_parts, axis=-1)                # [mb, D]
    dk3 = jnp.concatenate([pp.astype(dt) for pp in dk_parts], axis=-1)
    dv3 = jnp.concatenate([pp.astype(dt) for pp in dv_parts], axis=-1)
    dk2 = dk3.reshape(mb * L, D)
    dv2 = dv3.reshape(mb * L, D)
    dwq_ref[...] = _dot(xq.T, dq)
    dbq_ref[...] = jnp.sum(dq.astype(jnp.float32), axis=0, keepdims=True)
    dwk_ref[...] = _dot(x2.T, dk2)
    dbk_ref[...] = jnp.sum(dk2.astype(jnp.float32), axis=0, keepdims=True)
    dwv_ref[...] = _dot(x2.T, dv2)
    dbv_ref[...] = jnp.sum(dv2.astype(jnp.float32), axis=0, keepdims=True)
    dx2 = _dot(dk2, wk_ref[...].T) + _dot(dv2, wv_ref[...].T)
    dx3 = dx2.reshape(mb, L, D)
    # row qi additionally receives the q-projection and residual grads
    dxq = (_dot(dq, wq_ref[...].T) + dr1).astype(jnp.float32)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1) == qi)
    dx3 = dx3 + jnp.where(sel, dxq[:, None, :], 0.0)
    dx_ref[...] = dx3.astype(dt)


def _lastq_weights(params, dt):
    (wq, bq), (wk, bk), (wv, bv), (wo, bo), (g1, c1), \
        (w1, b1), (w2, b2), (g2, c2) = params
    return (wq.astype(dt), bq[None].astype(dt),
            wk.astype(dt), bk[None].astype(dt),
            wv.astype(dt), bv[None].astype(dt),
            wo.astype(dt), bo[None].astype(dt),
            g1[None].astype(jnp.float32), c1[None].astype(jnp.float32),
            w1.astype(dt), b1[None].astype(dt),
            w2.astype(dt), b2[None].astype(dt),
            g2[None].astype(jnp.float32), c2[None].astype(jnp.float32))


def _lastq_specs(B, Lp, D, F, mb):
    xs = pl.BlockSpec((mb, Lp, D), lambda i: (i, 0, 0))
    ms = pl.BlockSpec((mb, Lp), lambda i: (i, 0))
    ys = pl.BlockSpec((mb, D), lambda i: (i, 0))
    full2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    w_specs = [full2(D, D), full2(1, D), full2(D, D), full2(1, D),
               full2(D, D), full2(1, D), full2(D, D), full2(1, D),
               full2(1, D), full2(1, D), full2(D, F), full2(1, F),
               full2(F, D), full2(1, D), full2(1, D), full2(1, D)]
    return xs, ms, ys, w_specs, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_lastq(x, madd, flat_weights, static, seed):
    y, _ = _fused_lastq_fwd_impl(x, madd, flat_weights, static, seed)
    return y


def _fused_lastq_fwd_impl(x, madd, flat_weights, static, seed):
    qi, nh, hd, F, p_attn, p_hidden, act, eps, train = static
    B, L, D = x.shape
    xp, mp, Lp = _pad_L(x, madd, L)
    # much lighter VMEM than the full layer (no [MB, L, L] scores):
    # larger default blocks
    mb = _block_rows(B, "UNIREC_LASTQ_MB", 64)
    xs, ms, ys, w_specs, seed_spec = _lastq_specs(B, Lp, D, F, mb)
    kern = functools.partial(
        _lastq_fwd_kernel, qi=qi, nh=nh, hd=hd, F=F, p_attn=p_attn,
        p_hidden=p_hidden, act=act, eps=eps, train=train)
    y = pl.pallas_call(
        kern,
        grid=(B // mb,),
        in_specs=[xs, ms] + w_specs + [seed_spec],
        out_specs=ys,
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        interpret=_INTERPRET,
    )(xp, mp, *flat_weights, seed)
    return y, (x, madd, flat_weights, seed)


def _fused_lastq_fwd(x, madd, flat_weights, static, seed):
    return _fused_lastq_fwd_impl(x, madd, flat_weights, static, seed)


def _fused_lastq_bwd(static, res, g):
    qi, nh, hd, F, p_attn, p_hidden, act, eps, train = static
    x, madd, flat_weights, seed = res
    B, L, D = x.shape
    xp, mp, Lp = _pad_L(x, madd, L)
    mb = _block_rows(B, "UNIREC_LASTQ_MB_BWD", 64)
    n_prog = B // mb
    xs, ms, ys, w_specs, seed_spec = _lastq_specs(B, Lp, D, F, mb)
    kern = functools.partial(
        _lastq_bwd_kernel, qi=qi, nh=nh, hd=hd, F=F, p_attn=p_attn,
        p_hidden=p_hidden, act=act, eps=eps, train=train)

    def partial_spec(r, c):
        return (pl.BlockSpec((None, r, c), lambda i: (i, 0, 0)),
                jax.ShapeDtypeStruct((n_prog, r, c), jnp.float32))

    grad_sp = [partial_spec(D, D), partial_spec(1, D),
               partial_spec(D, D), partial_spec(1, D),
               partial_spec(D, D), partial_spec(1, D),
               partial_spec(D, D), partial_spec(1, D),
               partial_spec(1, D), partial_spec(1, D),
               partial_spec(D, F), partial_spec(1, F),
               partial_spec(F, D), partial_spec(1, D),
               partial_spec(1, D), partial_spec(1, D)]
    outs = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[xs, ms] + w_specs + [seed_spec, ys],
        out_specs=[xs] + [s for s, _ in grad_sp],
        out_shape=[jax.ShapeDtypeStruct((B, Lp, D), x.dtype)]
                  + [sh for _, sh in grad_sp],
        interpret=_INTERPRET,
    )(xp, mp, *flat_weights, seed, g)
    dx = outs[0][:, :L, :]
    dws = [o.sum(axis=0) for o in outs[1:]]
    dflat = tuple(dw.reshape(w.shape).astype(w.dtype)
                  for dw, w in zip(dws, flat_weights))
    return dx, None, dflat, None


_fused_lastq.defvjp(_fused_lastq_fwd, _fused_lastq_bwd)


def fused_last_query_layer(x, madd, params, *, n_heads: int, inner_size: int,
                           hidden_act: str, layer_norm_eps: float,
                           p_attn: float, p_hidden: float, train: bool,
                           dropout_rng=None, q_index=None):
    """Single-query final layer as one Pallas program per batch block:
    K/V projections for all rows stay in VMEM (the unfused lastq path
    round-trips them plus their head transposes through HBM), attention is
    one row per head, and the FFN runs on [MB, D]. Returns [B, D] — the
    layer output at the last real position (``q_index``, default L-1;
    callers on pre-padded inputs pass the last REAL row). Same param tuple
    as fused_transformer_layer; checkpoints transfer between paths."""
    B, L, D = x.shape
    qi = int(L - 1 if q_index is None else q_index)
    drop_on = train and (p_attn > 0.0 or p_hidden > 0.0) \
        and dropout_rng is not None
    if drop_on:
        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  np.iinfo(np.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    flat = _lastq_weights(params, x.dtype)
    static = (qi, n_heads, D // n_heads, int(inner_size),
              float(p_attn) if drop_on else 0.0,
              float(p_hidden) if drop_on else 0.0,
              str(hidden_act), float(layer_norm_eps), bool(drop_on))
    return _fused_lastq(x, madd, flat, static, seed)


def fused_layer_supported(x, hidden_act: str, n_heads: int,
                          inner_size: int | None = None) -> bool:
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    B, L, D = x.shape
    if hidden_act not in SUPPORTED_ACTS:
        return False
    if D % n_heads or (D // n_heads) % 8 or L > 512:
        return False
    # Both directions must fit the calibrated scoped-VMEM budget at some
    # legal block size (r4 advisor: the old gate admitted L up to 512 with
    # default blocks sized for L=56, which Mosaic rejects at runtime —
    # reproduced, then boundary-probed on a real chip; see _FWD_CAP).
    # This also covers the B%8!=0 whole-batch fallback: an odd batch only
    # passes when the single whole-batch program itself fits the budget.
    F = int(inner_size) if inner_size else 4 * D
    Lp = -(-L // 8) * 8
    return bool(_fit_mb(B, Lp, D, F, "UNIREC_LAYER_MB", 64, _FWD_CAP)
                and _fit_mb(B, Lp, D, F, "UNIREC_LAYER_MB_BWD", 16,
                            _BWD_CAP))


def fused_transformer_layer(x, madd, params, *, n_heads: int, inner_size: int,
                            hidden_act: str, layer_norm_eps: float,
                            p_attn: float, p_hidden: float, causal: bool,
                            train: bool, dropout_rng=None):
    """Run one whole post-LN transformer layer as a single Pallas program
    per MB-example block.

    x: [B, L, D] (compute dtype); madd: [B, L] additive key-pad row
    (0 / -10000); params: ((wq,bq),(wk,bk),(wv,bv),(wo,bo),(g1,c1),
    (w1,b1),(w2,b2),(g2,c2)) — exactly the nn.Dense/LayerNorm param leaves,
    so checkpoints transfer between the fused and unfused paths.
    """
    B, L, D = x.shape
    drop_on = train and (p_attn > 0.0 or p_hidden > 0.0) \
        and dropout_rng is not None
    if drop_on:
        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  np.iinfo(np.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    flat = _weights_tuple(params, x.dtype)
    static = (n_heads, D // n_heads, int(inner_size),
              float(p_attn) if drop_on else 0.0,
              float(p_hidden) if drop_on else 0.0,
              str(hidden_act), float(layer_norm_eps), bool(causal),
              bool(drop_on))
    return _fused_layer(x, madd, flat, static, seed)
