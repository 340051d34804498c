"""Blockwise (flash) causal attention — Pallas TPU kernel + XLA fallback.

The reference computes dense O(L²) attention with additive -10000 masks in
torch (modules.py:294-308). Histories are short (L=10-50) today, but the
kernel is written blockwise (SURVEY.md §5) so longer histories never need a
redesign: softmax is computed online per key block with running max/denom,
Q/K/V blocks stream through VMEM, and the backward pass recomputes attention
blockwise (no [B, H, L, L] tensor is ever materialized).

Numerics match the reference path: scores/sqrt(d) + additive mask, where the
mask encodes both causality and key-padding. The public entry
``causal_attention(q, k, v, mask)`` dispatches to the Pallas kernel on TPU
when shapes are tile-friendly, else to a pure-XLA implementation (also used
for interpret-mode testing).
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

MASK_VALUE = -1e4  # matches the reference additive mask (sasrec.py:56)

_INTERPRET = False  # flipped by tests on CPU


def xla_attention(q, k, v, mask):
    """[B,H,L,D] x [B,1 or H,L,L] additive mask → [B,H,L,D]."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    s = s + mask
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# --------------------------------------------------------------- pallas path
def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                *, blk_q: int, blk_k: int, scale: float):
    # refs are [L, D] / mask [L, L] for one (batch, head) program instance
    L, D = q_ref.shape

    def q_block(qb, _):
        q = q_ref[pl.ds(qb * blk_q, blk_q), :].astype(jnp.float32) * scale
        acc = jnp.zeros((blk_q, D), jnp.float32)
        m_i = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
        l_i = jnp.zeros((blk_q, 1), jnp.float32)

        def k_block(kb, carry):
            acc, m_i, l_i = carry
            k = k_ref[pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
            v = v_ref[pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            s = s + mask_ref[pl.ds(qb * blk_q, blk_q),
                             pl.ds(kb * blk_k, blk_k)].astype(jnp.float32)
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_i - m_new)
            l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_i

        acc, m_i, l_i = jax.lax.fori_loop(0, L // blk_k, k_block,
                                          (acc, m_i, l_i))
        o_ref[pl.ds(qb * blk_q, blk_q), :] = (acc / l_i).astype(o_ref.dtype)
        lse_ref[pl.ds(qb * blk_q, blk_q), :] = m_i + jnp.log(l_i)
        return _

    jax.lax.fori_loop(0, L // blk_q, q_block, None)


def _pick_blocks(L: int):
    blk = min(L, 128)
    while L % blk:
        blk //= 2
    return max(blk, 1)


def _pallas_fwd(q, k, v, mask):
    B, H, L, D = q.shape
    blk = _pick_blocks(L)
    scale = 1.0 / float(np.sqrt(D))
    mask_b = jnp.broadcast_to(mask, (B, H, L, L))

    kern = functools.partial(_fwd_kernel, blk_q=blk, blk_k=blk, scale=scale)
    out, lse = pl.pallas_call(
        kern,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((None, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, L, L), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, L, 1), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q.reshape(B * H, L, D), k.reshape(B * H, L, D),
      v.reshape(B * H, L, D), mask_b.reshape(B * H, L, L))
    return out.reshape(B, H, L, D), lse.reshape(B, H, L, 1)


# Below this sequence length the dense XLA attention is faster on TPU (the
# whole [L, L] tile fits in VMEM and the kernel's block loop only adds
# overhead — measured crossover ~L=256 on v5-class chips). Reference-scale
# histories (L=10-50) always take the XLA path.
MIN_FLASH_SEQ_LEN = 256


def _kernel_supported(q, mask) -> bool:
    B, H, L, D = q.shape
    if D % 8 != 0 or L % 8 != 0:
        return False
    if not _INTERPRET and (jax.default_backend() != "tpu"
                           or L < MIN_FLASH_SEQ_LEN):
        return False
    return True


@jax.custom_vjp
def flash_attention(q, k, v, mask):
    out, _ = _pallas_fwd(q, k, v, mask)
    return out


def _flash_fwd(q, k, v, mask):
    out, lse = _pallas_fwd(q, k, v, mask)
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(res, g):
    # Blockwise-recomputed backward in pure XLA: attention probabilities are
    # rebuilt from the saved logsumexp, so no [L, L] tensor is stored between
    # fwd and bwd. (A fully-Pallas backward is a follow-up; this keeps the
    # memory win while staying correct.)
    q, k, v, mask, out, lse = res
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale + mask
    p = jnp.exp(s - lse)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g.astype(jnp.float32))
    dp = jnp.einsum("bhqd,bhkd->bhqk", g.astype(jnp.float32),
                    v.astype(jnp.float32))
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                    keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ------------------------------------------------------- fused short-seq path
# Rec-model histories are SHORT (L = 10-50 across every reference config) and
# batches are huge, so attention cost is pure HBM traffic: the XLA path
# materializes [B, H, L, L] f32 score/softmax/dropout tensors several times
# per layer (1.3 GB each at B=32k, L=50) — profiling shows ~half the train
# step inside these ops (bench/ablate_step.py + bench/xplane.py). This kernel
# computes scores -> mask -> softmax -> dropout -> @V for a block of batch
# rows entirely in VMEM: HBM traffic is just Q,K,V in and O out. Dropout runs
# on the in-kernel PRNG; the backward kernel reseeds identically and replays
# the same mask, so nothing is stored between fwd and bwd.

_MAX_FUSED_SEQ_LEN = 512  # [L, L] f32 row block must fit VMEM comfortably


from unirec_tpu.ops.common import keep_mask as _keep_mask  # shared derivation


def _program_seed(seed_ref):
    # single combined scalar: the multi-argument prng_seed form fails to
    # compile on this Mosaic version (measured; single-arg compiles)
    return seed_ref[0] + pl.program_id(0) * 7919 + pl.program_id(1)


def _dropped_probs(S, m_ref, p_drop, mb, Lp, scale, out_dtype):
    """Per-row-block masked softmax (+ optional in-kernel dropout) of the
    batched score matrix S [mb*Lp, mb*Lp] (f32, unscaled); off-block entries
    come back 0 and the result is cast to ``out_dtype`` for the @V matmul.

    S packs mb independent rows' scores; only the diagonal [Lp, Lp] blocks
    are meaningful. Doing QKᵀ as ONE [mb*Lp, D]x[D, mb*Lp] matmul wastes
    mb-fold MXU flops on off-block products but replaces mb tiny matmuls —
    per-row [Lp, D] dots measured far slower than one big MXU op (the
    fori_loop kernel version lost to dense XLA end-to-end). Softmax/dropout
    then run on the 1x-work diagonal slices only (static Python unroll,
    pure VMEM ops)."""
    blocks = []
    for i in range(mb):
        sl = slice(i * Lp, (i + 1) * Lp)
        s = S[sl, sl] * scale + m_ref[i].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if p_drop > 0.0:
            keep = _keep_mask(p.shape, p_drop)
            p = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)
        blocks.append(p.astype(out_dtype))
    return _block_diag(blocks, Lp, mb)


def _block_diag(blocks, Lp, mb):
    """Assemble diag(blocks) [mb*Lp, mb*Lp] with static concatenation —
    functional .at[].set updates lower to an (unsupported) Mosaic scatter."""
    if mb == 1:
        return blocks[0]
    dtype = blocks[0].dtype
    rows = []
    for i, p in enumerate(blocks):
        parts = []
        if i:
            parts.append(jnp.zeros((Lp, i * Lp), dtype))
        parts.append(p)
        if mb - 1 - i:
            parts.append(jnp.zeros((Lp, (mb - 1 - i) * Lp), dtype))
        rows.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])
    return jnp.concatenate(rows, axis=0)


def _fused_fwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, o_ref,
                      *, scale: float, p_drop: float, mb: int):
    if p_drop > 0.0:
        pltpu.prng_seed(_program_seed(seed_ref))
    Lp, D = q_ref.shape[1], q_ref.shape[2]
    # matmuls stay in the INPUT dtype (bf16 under compute_dtype=bfloat16 —
    # the MXU's f32 rate is ~4x slower) with f32 accumulation; the scale is
    # applied to the f32 scores, which is also the more precise order.
    # Measured (bench/bench_attention.py --dtype bfloat16): this closed the
    # forward micro gap to near-parity (35.9 vs XLA 33.7 ms) but the bwd
    # kernel still loses (72.8 vs 52.1) — the (B/mb) x H grid issues 8192
    # programs of ~28 KB DMAs and is overhead-bound. Kernel stays opt-in;
    # the remaining idea is coarser blocking (UNIREC_FUSED_MB) and fusing
    # across the whole layer rather than a better attention-only kernel.
    Q = q_ref[...].reshape(mb * Lp, D)
    K = k_ref[...].reshape(mb * Lp, D)
    V = v_ref[...].reshape(mb * Lp, D)
    prec = mm_precision(Q.dtype)
    S = jnp.dot(Q, K.T, preferred_element_type=jnp.float32, precision=prec)
    P = _dropped_probs(S, m_ref, p_drop, mb, Lp, scale, Q.dtype)
    O = jnp.dot(P, V, preferred_element_type=jnp.float32, precision=prec)
    o_ref[...] = O.reshape(mb, Lp, D).astype(o_ref.dtype)


def _fused_bwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, do_ref,
                      dq_ref, dk_ref, dv_ref,
                      *, scale: float, p_drop: float, mb: int):
    if p_drop > 0.0:
        # identical seeding + generation order to the forward kernel → the
        # dropout mask replays exactly (same per-block slice order)
        pltpu.prng_seed(_program_seed(seed_ref))
    Lp, D = q_ref.shape[1], q_ref.shape[2]
    Q = q_ref[...].reshape(mb * Lp, D)
    K = k_ref[...].reshape(mb * Lp, D)
    V = v_ref[...].reshape(mb * Lp, D)
    dO = do_ref[...].reshape(mb * Lp, D)
    prec = mm_precision(Q.dtype)
    S = jnp.dot(Q, K.T, preferred_element_type=jnp.float32, precision=prec)

    # recompute y (pre-dropout softmax) and z (post-dropout) blockwise; also
    # build dy = dropout-bwd(dZ) and ds = softmax-bwd(dy) in the same pass
    dZ = jnp.dot(dO, V.T, preferred_element_type=jnp.float32,
                 precision=prec)
    z_blocks, ds_blocks = [], []
    inv = 1.0 / (1.0 - p_drop) if p_drop > 0.0 else 1.0
    for i in range(mb):
        sl = slice(i * Lp, (i + 1) * Lp)
        s = S[sl, sl] * scale + m_ref[i].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        y = jnp.exp(s)
        y = y / jnp.sum(y, axis=-1, keepdims=True)
        dz = dZ[sl, sl]
        if p_drop > 0.0:
            keep = _keep_mask(y.shape, p_drop)
            z = jnp.where(keep, y * inv, 0.0)
            dy = jnp.where(keep, dz * inv, 0.0)
        else:
            z = y
            dy = dz
        t = jnp.sum(dy * y, axis=-1, keepdims=True)
        z_blocks.append(z.astype(Q.dtype))
        ds_blocks.append((y * (dy - t)).astype(Q.dtype))
    Zb = _block_diag(z_blocks, Lp, mb)
    dS = _block_diag(ds_blocks, Lp, mb)
    dv = jnp.dot(Zb.T, dO, preferred_element_type=jnp.float32,
                 precision=prec)
    dq = jnp.dot(dS, K, preferred_element_type=jnp.float32,
                 precision=prec) * scale
    dk = jnp.dot(dS.T, Q, preferred_element_type=jnp.float32,
                 precision=prec) * scale
    dq_ref[...] = dq.reshape(mb, Lp, D).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(mb, Lp, D).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(mb, Lp, D).astype(dv_ref.dtype)


def _pad_len(L: int) -> int:
    return -(-L // 8) * 8


def _fused_prep(q, k, v, mask):
    """Pad L to a sublane multiple; padded keys are masked off."""
    B, H, L, D = q.shape
    Lp = _pad_len(L)
    if Lp != L:
        padder = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q, k, v = (jnp.pad(x, padder) for x in (q, k, v))
        # padded KEYS must get exactly zero probability — the reference's
        # -1e4 additive mask is soft (fully-masked rows attend uniformly
        # over all real keys), so padding with -1e4 would leak probability
        # onto the fake columns and change those rows' outputs
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, Lp - L), (0, Lp - L)],
                       constant_values=-1e30)
    return q, k, v, mask, Lp


def _fused_specs(B, H, Lp, D, mb, mask_heads):
    qkv = pl.BlockSpec((mb, None, Lp, D), lambda i, j: (i, j, 0, 0))
    mspec = pl.BlockSpec((mb, None, Lp, Lp),
                         (lambda i, j: (i, j, 0, 0)) if mask_heads > 1
                         else (lambda i, j: (i, 0, 0, 0)))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, mspec, seed


# p_drop is static (nondiff); seed is a traced int32[1] array whose
# cotangent is None
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, mask, p_drop, seed):
    out, _ = _fused_call(q, k, v, mask, p_drop, seed)
    return out


def _fused_block_rows(B, Lp):
    # batched score matrix is [mb*Lp, mb*Lp] f32; bwd holds ~4 of them in
    # VMEM (S, dZ, Z, dS) -> keep mb*Lp around 512 (4 x 1 MB).
    # UNIREC_FUSED_MB overrides for A/B scans (bench/bench_attention.py).
    env = os.environ.get("UNIREC_FUSED_MB")
    mb = int(env) if env else 8
    while mb > 1 and (B % mb or (env is None and mb * Lp > 512)):
        mb //= 2
    return max(mb, 1)


def _fused_call(q, k, v, mask, p_drop, seed):
    B, H, L, D = q.shape
    qp, kp, vp, mp, Lp = _fused_prep(q, k, v, mask)
    mb = _fused_block_rows(B, Lp)
    qkv_spec, m_spec, seed_spec = _fused_specs(B, H, Lp, D, mb, mask.shape[1])
    kern = functools.partial(_fused_fwd_kernel, scale=1.0 / float(np.sqrt(D)),
                             p_drop=float(p_drop), mb=mb)
    out = pl.pallas_call(
        kern,
        grid=(B // mb, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, m_spec, seed_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, D), q.dtype),
        interpret=_INTERPRET,
    )(qp, kp, vp, mp, seed)
    return out[:, :, :L, :], (q, k, v, mask)


def _fused_attention_fwd(q, k, v, mask, p_drop, seed):
    out, res = _fused_call(q, k, v, mask, p_drop, seed)
    return out, res + (seed,)


def _fused_attention_bwd(p_drop, res, g):
    q, k, v, mask, seed = res
    B, H, L, D = q.shape
    qp, kp, vp, mp, Lp = _fused_prep(q, k, v, mask)
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, Lp - L), (0, 0)]) if Lp != L else g
    mb = _fused_block_rows(B, Lp)
    qkv_spec, m_spec, seed_spec = _fused_specs(B, H, Lp, D, mb, mask.shape[1])
    kern = functools.partial(_fused_bwd_kernel, scale=1.0 / float(np.sqrt(D)),
                             p_drop=float(p_drop), mb=mb)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B // mb, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, m_spec, seed_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, Lp, D), q.dtype)] * 3,
        interpret=_INTERPRET,
    )(qp, kp, vp, mp, seed, gp)
    return (dq[:, :, :L, :], dk[:, :, :L, :], dv[:, :, :L, :], None, None)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_supported(q, mask) -> bool:
    B, H, L, D = q.shape
    if L > _MAX_FUSED_SEQ_LEN:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    return True


def short_attention(q, k, v, mask, p_drop: float = 0.0, dropout_rng=None,
                    train: bool = False):
    """Fused attention for short sequences, with optional in-kernel dropout.

    Falls back to the XLA path (with flax-style dropout semantics via the
    same rng) when the kernel isn't supported on this backend."""
    drop = float(p_drop) if train and dropout_rng is not None else 0.0
    # pltpu.prng_* has no CPU interpret lowering — dropout path is TPU-only
    if fused_supported(q, mask) and not (drop > 0.0 and _INTERPRET):
        if drop > 0.0:
            seed = jax.random.randint(dropout_rng, (1,), 0, np.iinfo(np.int32).max,
                                      dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        return fused_attention(q, k, v, mask, drop, seed)
    p = xla_attention_probs(q, k, mask)
    if drop > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - drop, p.shape)
        p = jnp.where(keep, p / (1.0 - drop), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def xla_attention_probs(q, k, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    return jax.nn.softmax(s + mask, axis=-1)


def causal_attention(q, k, v, mask, use_pallas: bool = True):
    """Masked attention entry point: Pallas kernel when supported, XLA
    otherwise. mask: additive [B, 1 or H, L, L]."""
    if use_pallas and _kernel_supported(q, mask):
        if mask.shape[1] == 1:
            mask = jnp.broadcast_to(mask, (q.shape[0], q.shape[1],
                                           mask.shape[2], mask.shape[3]))
        return flash_attention(q, k, v, mask)
    return xla_attention(q, k, v, mask)
