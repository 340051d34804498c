"""Shared flax NN blocks.

Math parity targets (reference unirec/model/modules.py):
  - InnerProduct/Cosine/MLP scorers (modules.py:45-132) — note the reference
    cosine divides by the *product of squared norms*, reproduced verbatim;
  - post-LayerNorm Transformer encoder with additive -10000 masks
    (modules.py:247-433);
  - AttentionMergeLayer (modules.py:226-244);
  - AdaRanker machinery: NeuProcessEncoder, FiLM-style AdaLinear patches and
    MemoryUnit (modules.py:445-731) — implemented as einsums over per-request
    generated parameters.

Initialization mirrors reco_abc.py:19-58: 'normal' (mean/std from config),
'xavier_normal', 'xavier_uniform' on Embed/Dense kernels; zero biases;
LayerNorm scale=1, bias=0.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ACT2FN = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leakyrelu": jax.nn.leaky_relu,
}

MASK_VALUE = -10000.0


def make_initializer(method: str, mean: float = 0.0, std: float = 0.02):
    if method == "xavier_normal":
        return nn.initializers.glorot_normal()
    if method == "xavier_uniform":
        return nn.initializers.glorot_uniform()

    def normal_init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return normal_init


def zero_pad_row(table: jnp.ndarray) -> jnp.ndarray:
    """Zero row 0 of an embedding table (padding_idx=0 semantics)."""
    return table.at[0].set(0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _byte_mask_dropout(x, key, thr, inv_keep):
    bits = jax.random.bits(key, x.shape, jnp.uint8)
    return jnp.where(bits >= jnp.uint8(thr), x * inv_keep, jnp.zeros_like(x))


def _byte_mask_dropout_fwd(x, key, thr, inv_keep):
    # residual = the KEY ONLY (a few words). The default autodiff path
    # stores the [shape]-sized mask (and the dropped tensor feeding any
    # downstream matmul) between forward and backward; regenerating the
    # bits from the hardware RNG is pure compute in a memory-bound step.
    return _byte_mask_dropout(x, key, thr, inv_keep), (key, x.shape)


def _byte_mask_dropout_bwd(thr, inv_keep, res, g):
    key, shape = res
    bits = jax.random.bits(key, shape, jnp.uint8)
    return (jnp.where(bits >= jnp.uint8(thr), g * inv_keep,
                      jnp.zeros_like(g)), None)


_byte_mask_dropout.defvjp(_byte_mask_dropout_fwd, _byte_mask_dropout_bwd)


class Dropout8(nn.Module):
    """Dropout whose mask comes from ONE random byte per element instead of
    a u32 word: the rng materializes 4x less HBM (the [B, H, L, L]
    attention-dropout u32 tensor + its layout copy measured ~13 ms/step at
    bench shapes). The keep threshold is quantized to 1/256 — the realized
    keep probability ceil/round(rate*256)/256 is used for the rescale, so
    E[output] == input exactly. Opt-in via ``dropout_bits=8`` (the default
    flax Dropout keeps the reference-default behavior).

    ``remat=True`` (config ``dropout_mask_remat=1``) stores NO mask between
    forward and backward: a custom VJP keeps only the rng key and
    regenerates the byte mask in the backward pass. Same key -> same bits
    -> same mask, so the loss is bit-identical (grads match to float
    reassociation); trades a second hardware-RNG draw for the mask
    tensor's HBM write+read."""

    rate: float
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        thr = int(round(self.rate * 256.0))
        if deterministic or thr <= 0:
            return x
        if thr >= 256:
            return jnp.zeros_like(x)
        keep_p = 1.0 - thr / 256.0
        key = self.make_rng("dropout")
        if self.remat:
            return _byte_mask_dropout(x, key, thr, 1.0 / keep_p)
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        return jnp.where(bits >= jnp.uint8(thr), x * (1.0 / keep_p),
                         jnp.zeros_like(x))


def apply_dropout(x, rate: float, train: bool, bits8: bool = False,
                  mask_remat: bool = False):
    """Inline dropout used inside @nn.compact bodies; ``bits8`` selects the
    byte-mask variant (no params either way, same 'dropout' rng stream, so
    the param tree is independent of the choice); ``mask_remat`` the
    key-only-residual VJP (byte-mask path only)."""
    if bits8:
        return Dropout8(rate, remat=mask_remat)(x, deterministic=not train)
    return nn.Dropout(rate, deterministic=not train)(x)


# --------------------------------------------------------------------- scorers
def inner_product_scores(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Dim-dispatching dot scorer (modules.py:45-67).

    Supported: [B,D]x[B,D]→[B]; [B,D]x[M,D]→[B,M]; [B,G,D]x[B,D]→[B,G];
    [B,D]x[B,G,D]→[B,G].
    """
    if x.ndim == y.ndim:
        if x.shape[0] == y.shape[0] and x.shape == y.shape:
            return jnp.sum(x * y, axis=-1)
        return x @ y.T
    if x.ndim > y.ndim:  # [B,G,D] x [B,D]
        return jnp.einsum("bgd,bd->bg", x, y)
    return jnp.einsum("bd,bgd->bg", x, y)  # [B,D] x [B,G,D]


def cosine_scores(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Reference CosineScorer (modules.py:70-81): ip / max(|x|^2·|y|^2, eps)."""
    x_len = jnp.sum(x * x, axis=-1, keepdims=True)
    y_len = jnp.sum(y * y, axis=-1, keepdims=True)
    deno = inner_product_scores(x_len, y_len)
    ip = inner_product_scores(x, y)
    return ip / jnp.maximum(deno, eps)


class MLPScorer(nn.Module):
    """2-layer MLP over [user ⊕ item] (modules.py:84-132)."""

    embed_dim: int
    hidden_dim: int
    dropout_prob: float = 0.0
    act_f: str = "tanh"
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == y.ndim:
            if x.shape != y.shape:
                x = jnp.broadcast_to(x[:, None, :], (x.shape[0], y.shape[0], x.shape[-1]))
                y = jnp.broadcast_to(y[None, :, :], x.shape)
        elif x.ndim > y.ndim:
            y = jnp.broadcast_to(y[..., None, :], x.shape)
        else:
            x = jnp.broadcast_to(x[..., None, :], y.shape)
        h = jnp.concatenate([x, y], axis=-1)
        act = ACT2FN[self.act_f]
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        h = nn.Dense(self.hidden_dim, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros)(h)
        h = act(h)
        h = nn.Dense(1, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros)(h)
        return h[..., 0]


# ----------------------------------------------------------------- transformer
class MultiHeadAttention(nn.Module):
    """Post-LN self-attention (modules.py:247-316)."""

    n_heads: int
    hidden_size: int
    hidden_dropout_prob: float
    attn_dropout_prob: float
    layer_norm_eps: float
    kernel_init: Callable = nn.initializers.normal(0.02)
    use_flash: bool = False
    use_fused: bool = False  # opt-in fused short-seq kernel (see dispatch)
    dtype: Any = None  # computation dtype (params stay fp32)
    # keep q/k/v in [B, L, H, d] and let dot_general carry the head axis —
    # skips the 6 head-split layout copies per layer the [B, H, L, d]
    # formulation costs. Numerics identical (same contractions); opt-in
    # pending TPU A/B measurement (bench/bench_step_variants.py).
    direct_layout: bool = False
    bits8: bool = False  # byte-mask dropout (see Dropout8)
    # compute Q, K, V as ONE [H, 3H] matmul and split — 1/3 the op
    # boundaries (candidate fix for the measured per-layer head-split
    # layout copies). Param structure changes ('qkv' kernel instead of
    # query/key/value), so opt-in; numerics identical to the unpacked form
    # with concatenated kernels (tests/test_kernels.py).
    qkv_packed: bool = False
    # attend from ONLY the final query position (sequences are left-padded,
    # so the consumed position is always index L-1 — sasrec.py:59-76 /
    # seqrecdataset.py:60-68). Keys/values stay full-length; the output is
    # [B, 1, H]. In eval mode this is bit-identical to slicing the full
    # output (same contractions per output element); in train mode the
    # dropout masks draw fewer bits, so trajectories differ bit-wise but
    # distributions are identical. Used by TransformerEncoder for the last
    # layer when the downstream consumer only reads the final position —
    # it removes that layer's [B, H, L, L] score/softmax/dropout traffic
    # (the measured majority of the train step's HBM bytes).
    last_query: bool = False
    # TPU tile-padding fix: every [B, nh, L, L] / [B, nh, L, hd] tensor of
    # the per-head formulation puts (L, L) or (L, hd) on the (sublane, lane)
    # tile dims, and at reference shapes (L=50, hd=32 vs the 8x128 tile)
    # that wastes 2.9-4.4x of the attention core's HBM in pure padding —
    # the measured majority of this block's cost. head_stacked computes ALL
    # heads in one [B, L, H] @ [B, H, nh*L] batched matmul against
    # block-diagonal stacked keys/values (k'[b, h*L+j, :] holds k_h[b, j]
    # in d-block h, zero elsewhere; q's natural [B, L, H] layout already
    # has head h in d-block h, so the full-H dot IS the per-head dot).
    # Scores/probs live as [B, L, nh*L] (minor dim nh*L: 1.28x padding at
    # nh=2, L=50 instead of 2.56x) and the six per-layer head-split
    # transposes disappear. Same math per element (parity-tested); costs
    # nh-times the (tiny) score FLOPs and an nh-times-larger k'/v' buffer,
    # so it is gated to small nh*L and stays opt-in pending the TPU A/B.
    head_stacked: bool = False
    # key-only-residual dropout VJP (see Dropout8.remat); bits8 path only
    mask_remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, L, H = x.shape
        if self.head_stacked:
            return self._head_stacked_attention(x, attn_mask, train)
        if self.last_query:
            return self._last_query_attention(x, attn_mask, train)
        nh = self.n_heads
        hd = H // nh
        dense = lambda name: nn.Dense(H, kernel_init=self.kernel_init,
                                      bias_init=nn.initializers.zeros,
                                      dtype=self.dtype, name=name)
        if self.qkv_packed:
            qkv = nn.Dense(3 * H, kernel_init=self.kernel_init,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name="qkv")(x)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
            project = {"query": lambda _: qp, "key": lambda _: kp,
                       "value": lambda _: vp}
        else:
            project = {n: dense(n) for n in ("query", "key", "value")}
        if self.direct_layout and not self.use_fused and not self.use_flash:
            q4 = project["query"](x).reshape(B, L, nh, hd)
            k4 = project["key"](x).reshape(B, L, nh, hd)
            v4 = project["value"](x).reshape(B, L, nh, hd)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / jnp.sqrt(float(hd))
            scores = scores + attn_mask.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = apply_dropout(probs, self.attn_dropout_prob, train,
                                  self.bits8, self.mask_remat)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v4).reshape(B, L, H)
            out = dense("dense")(ctx)
            out = apply_dropout(out, self.hidden_dropout_prob, train,
                                self.bits8, self.mask_remat)
            return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                                name="LayerNorm")(out + x)
        q = project["query"](x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        k = project["key"](x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        v = project["value"](x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

        from unirec_tpu.ops import attention as attn_ops
        drop_on = train and self.attn_dropout_prob > 0.0
        if self.use_fused and attn_ops.fused_supported(q, attn_mask):
            # fused short-seq kernel (in-kernel PRNG dropout, no [B,H,L,L]
            # HBM tensor). OPT-IN: at reference shapes (L<=50, D=32) the
            # XLA batched-einsum path measured faster than both kernel
            # designs (bench/bench_attention.py — 38.5 ms vs 54 ms fwd at
            # B=32k), so the dense path below stays the default; the kernel
            # wins as L/D grow toward the VMEM limit.
            ctx = attn_ops.short_attention(
                q, k, v, attn_mask, p_drop=self.attn_dropout_prob,
                dropout_rng=self.make_rng("dropout") if drop_on else None,
                train=train)
        elif self.use_flash and attn_ops._kernel_supported(q, attn_mask) \
                and not drop_on:
            ctx = attn_ops.causal_attention(q, k, v, attn_mask)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(hd))
            # cast the additive -10000 mask to the compute dtype: a f32 mask
            # would upcast scores→softmax→dropout→probs@V back to f32 and
            # double the HBM traffic of the dominant [B,H,L,L] tensors
            # (measured: the attention core is memory-bound, not compute-bound)
            scores = scores + attn_mask.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = apply_dropout(probs, self.attn_dropout_prob, train,
                                  self.bits8, self.mask_remat)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        out = dense("dense")(ctx)
        out = apply_dropout(out, self.hidden_dropout_prob, train, self.bits8,
                            self.mask_remat)
        # LN in the compute dtype too — an f32 LN forces an f32 round-trip
        # around every residual block (params stay f32 via param_dtype)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(out + x)

    def _last_query_attention(self, x, attn_mask, train):
        """Single-query attention: q = x[:, -1:], k/v full. Same params as
        the full path (query/key/value/dense or packed qkv), so the flag can
        be toggled on an existing checkpoint."""
        B, L, H = x.shape
        nh = self.n_heads
        hd = H // nh
        dense = lambda name: nn.Dense(H, kernel_init=self.kernel_init,
                                      bias_init=nn.initializers.zeros,
                                      dtype=self.dtype, name=name)
        xq = x[:, L - 1:, :]  # [B, 1, H]
        if self.qkv_packed:
            # keep the packed-param structure; the wasted q rows are one
            # [B,L,H]x[H,H] matmul — noise next to the attention core
            qkv = nn.Dense(3 * H, kernel_init=self.kernel_init,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name="qkv")(x)
            qp_full, kp, vp = jnp.split(qkv, 3, axis=-1)
            qp = qp_full[:, L - 1:, :]
        else:
            qp = dense("query")(xq)
            kp = dense("key")(x)
            vp = dense("value")(x)
        q = qp.reshape(B, 1, nh, hd).transpose(0, 2, 1, 3)      # [B,h,1,d]
        k = kp.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)      # [B,h,L,d]
        v = vp.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(hd))
        # final query row of the additive mask. NEGATIVE index: bidirectional
        # masks broadcast the query dim to size 1 ([B,1,1,L]), where L-1:
        # would slice past the end and yield an empty [B,1,0,L]
        mask_row = attn_mask[..., -1:, :]  # causal row L-1 = key-pad mask
        scores = scores + mask_row.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = apply_dropout(probs, self.attn_dropout_prob, train, self.bits8,
                              self.mask_remat)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, H)
        out = dense("dense")(ctx)
        out = apply_dropout(out, self.hidden_dropout_prob, train, self.bits8,
                            self.mask_remat)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(out + xq)

    def _head_stacked_attention(self, x, attn_mask, train):
        """All heads in one batched matmul against block-diagonal stacked
        keys/values (see ``head_stacked`` above). Parameter structure is
        identical to the default path, so the flag can be toggled on an
        existing checkpoint; composes with ``last_query`` (q shrinks to the
        final row, k'/v' stay stacked)."""
        B, L, H = x.shape
        nh = self.n_heads
        hd = H // nh
        dense = lambda name: nn.Dense(H, kernel_init=self.kernel_init,
                                      bias_init=nn.initializers.zeros,
                                      dtype=self.dtype, name=name)
        if self.qkv_packed:
            qkv = nn.Dense(3 * H, kernel_init=self.kernel_init,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name="qkv")(x)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = dense("query")(x)
            kp = dense("key")(x)
            vp = dense("value")(x)
        if self.last_query:
            xq = x[:, L - 1:, :]
            qp = qp[:, L - 1:, :]
        else:
            xq = x
        Q = qp.shape[1]

        def stack(p):  # [B, L, H] -> block-diagonal [B, nh*L, H]
            p4 = p.reshape(B, L, nh, hd)
            blocks = [jnp.pad(p4[:, :, h, :],
                              ((0, 0), (0, 0), (h * hd, H - (h + 1) * hd)))
                      for h in range(nh)]
            return jnp.concatenate(blocks, axis=1)

        kx = stack(kp)
        vx = stack(vp)
        # q[b, i, :] holds head h in d-block h and kx[b, h*L+j, :] is zero
        # outside d-block h, so the full-H contraction IS the per-head dot
        scores = jnp.einsum("bqd,bkd->bqk", qp, kx) / jnp.sqrt(float(hd))
        # additive causal mask rows, tiled along the stacked key axis
        # (key j' = h*L + j carries mask[..., j]). NEGATIVE index: a
        # bidirectional mask's query dim is broadcast to 1 and would slice
        # empty under L-Q:; -Q: keeps the size-1 row, which broadcasts
        mrow = attn_mask[:, 0, -Q:, :].astype(scores.dtype)  # [B, Q|1, L]
        scores = scores + jnp.tile(mrow, (1, 1, nh))
        # per-head softmax: reduce each length-L block of the stacked axis
        m = scores.reshape(B, Q, nh, L).max(-1)
        e = jnp.exp(scores - jnp.repeat(m, L, axis=-1))
        z = e.reshape(B, Q, nh, L).sum(-1)
        probs = e / jnp.repeat(z, L, axis=-1)
        probs = apply_dropout(probs, self.attn_dropout_prob, train, self.bits8,
                              self.mask_remat)
        ctx = jnp.einsum("bqk,bkd->bqd", probs, vx)
        out = dense("dense")(ctx)
        out = apply_dropout(out, self.hidden_dropout_prob, train, self.bits8,
                            self.mask_remat)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(out + xq)


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel/bias) without the matmul —
    lets the fused-FFN path own the identical param tree as the nn.Dense
    modules it replaces (checkpoints trained either way load both ways)."""

    in_features: int
    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias) without the computation."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class _MHAParams(nn.Module):
    """Param tree of MultiHeadAttention (query/key/value/dense/LayerNorm)
    for the whole-layer fused kernel — checkpoints transfer both ways."""

    hidden_size: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        dense = [_DenseParams(self.hidden_size, self.hidden_size,
                              self.kernel_init, name=n)()
                 for n in ("query", "key", "value", "dense")]
        ln = _LNParams(self.hidden_size, name="LayerNorm")()
        return dense, ln


class _FFNParams(nn.Module):
    """Param tree of FeedForward (dense_1/dense_2/LayerNorm)."""

    hidden_size: int
    inner_size: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        d1 = _DenseParams(self.hidden_size, self.inner_size,
                          self.kernel_init, name="dense_1")()
        d2 = _DenseParams(self.inner_size, self.hidden_size,
                          self.kernel_init, name="dense_2")()
        ln = _LNParams(self.hidden_size, name="LayerNorm")()
        return d1, d2, ln


class _LayerParams(nn.Module):
    """Param tree of one TransformerLayer, for the encoder-level fused
    chain — named `layer_{i}` so paths match the per-layer modules exactly
    (checkpoints transfer between the chain and the unfused loop)."""

    hidden_size: int
    inner_size: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        dense, ln1 = _MHAParams(self.hidden_size, self.kernel_init,
                                name="multi_head_attention")()
        d1, d2, ln2 = _FFNParams(self.hidden_size, self.inner_size,
                                 self.kernel_init, name="feed_forward")()
        return tuple(dense) + (ln1, d1, d2, ln2)


class FeedForward(nn.Module):
    """Pointwise FFN with residual post-LN (modules.py:319-355).

    ``fused=True`` routes dense_1→act→dense_2 through the Pallas
    ``ops.ffn.fused_ffn`` kernel: the [tokens, inner_size] activation stays
    in VMEM instead of round-tripping HBM twice forward (plus its autodiff
    residual backward). Same params, same math (bf16 operands, f32
    accumulation); dropout + residual LayerNorm stay outside (their traffic
    is hidden_size-wide).

    Measured at bench shapes (B=32768, L=50, D=64, F=128, v5e): LOSES
    end-to-end — 163.1 vs 125.7 ms/step (bench/bench_step_variants.py
    lastq+ffn vs bits8+lastq, identical final loss). The inner activation's
    HBM round-trip is only a few ms at F=128 while the backward kernel's
    dW accumulation serializes its 1600-block grid. Opt-in for the
    large-F regime; default off (docs/performance_notes.md).
    """

    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float
    hidden_act: str
    layer_norm_eps: float
    kernel_init: Callable = nn.initializers.normal(0.02)
    dtype: Any = None
    bits8: bool = False
    fused: bool = False
    mask_remat: bool = False  # key-only-residual dropout VJP (Dropout8.remat)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.fused and self.hidden_act in (
                "relu", "swish", "sigmoid", "tanh", "gelu", "leakyrelu"):
            from unirec_tpu.ops import ffn as ffn_ops
            w1, b1 = _DenseParams(x.shape[-1], self.inner_size,
                                  self.kernel_init, name="dense_1")()
            w2, b2 = _DenseParams(self.inner_size, self.hidden_size,
                                  self.kernel_init, name="dense_2")()
            dt = self.dtype or jnp.promote_types(x.dtype, w1.dtype)
            x2 = x.reshape(-1, x.shape[-1]).astype(dt)
            y = ffn_ops.fused_ffn(
                x2, w1.astype(dt), b1.astype(dt), w2.astype(dt),
                b2.astype(dt), self.hidden_act, 1024,
                ffn_ops._INTERPRET or jax.default_backend() != "tpu")
            h = y.reshape(x.shape[:-1] + (self.hidden_size,))
        else:
            h = nn.Dense(self.inner_size, kernel_init=self.kernel_init,
                         bias_init=nn.initializers.zeros, dtype=self.dtype,
                         name="dense_1")(x)
            h = ACT2FN[self.hidden_act](h)
            h = nn.Dense(self.hidden_size, kernel_init=self.kernel_init,
                         bias_init=nn.initializers.zeros, dtype=self.dtype,
                         name="dense_2")(h)
        h = apply_dropout(h, self.hidden_dropout_prob, train, self.bits8,
                          self.mask_remat)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(h + x)


class TransformerLayer(nn.Module):
    n_heads: int
    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float
    attn_dropout_prob: float
    hidden_act: str
    layer_norm_eps: float
    kernel_init: Callable = nn.initializers.normal(0.02)
    use_flash: bool = False
    use_fused: bool = False
    dtype: Any = None
    direct_layout: bool = False
    bits8: bool = False
    qkv_packed: bool = False
    last_query: bool = False
    head_stacked: bool = False
    fused_ffn: bool = False
    mask_remat: bool = False  # key-only-residual dropout VJP (Dropout8.remat)
    # run the ENTIRE layer (qkv→attn→softmax→dropout→@V→proj→LN→FFN→LN) as
    # one Pallas program per batch block (ops/layer.py) — no [B, H, L, L]
    # or [B, L, D] intermediate ever reaches HBM. Param tree identical to
    # the unfused path. Requires the mask to be a causal_attention_mask
    # (key-padding row ⊗ optional causal triangle; `fused_causal` says
    # which) — true for every model that uses TransformerEncoder. In-kernel
    # PRNG dropout: same distribution, different stream (like rbg/bits8),
    # so opt-in, measured lever.
    fused_layer: bool = False
    fused_causal: bool = True
    # single-query FINAL layer as a Pallas kernel (opt-in, measured lever
    # like fused_layer — config fused_lastq=1; only takes effect on the
    # layer that runs with last_query)
    fused_lastq: bool = False

    def _fused_gate(self, x, train):
        """Shared gate + plumbing for the Pallas layer kernels: returns
        (params, dropout_rng, kwargs) or None when the kernels can't run
        here (CPU without interpret, unsupported act/shape, or in-kernel
        dropout under interpret — pltpu.prng_* has no CPU lowering, like
        ops/attention.py::short_attention). Param tree identical to the
        unfused MultiHeadAttention + FeedForward modules."""
        from unirec_tpu.ops import layer as layer_ops
        drop_on = train and (self.attn_dropout_prob > 0.0
                             or self.hidden_dropout_prob > 0.0)
        if not layer_ops.fused_layer_supported(x, self.hidden_act,
                                               self.n_heads,
                                               self.inner_size) \
                or (drop_on and layer_ops._INTERPRET):
            return None
        (dense, ln1) = _MHAParams(self.hidden_size, self.kernel_init,
                                  name="multi_head_attention")()
        (d1, d2, ln2) = _FFNParams(self.hidden_size, self.inner_size,
                                   self.kernel_init, name="feed_forward")()
        params = tuple(dense) + (ln1, d1, d2, ln2)
        rng = self.make_rng("dropout") if drop_on else None
        kwargs = dict(n_heads=self.n_heads, inner_size=self.inner_size,
                      hidden_act=self.hidden_act,
                      layer_norm_eps=self.layer_norm_eps,
                      p_attn=self.attn_dropout_prob,
                      p_hidden=self.hidden_dropout_prob, train=train,
                      dropout_rng=rng)
        return params, kwargs

    @nn.compact
    def __call__(self, x, attn_mask, train: bool):
        special = self.last_query or self.head_stacked
        if self.fused_lastq and self.last_query and not self.head_stacked \
                and not self.qkv_packed:
            # single-query FINAL layer as one Pallas program per block
            # (ops/layer.py::fused_last_query_layer): K/V and their head
            # views never reach HBM. Same param tree as the unfused path.
            from unirec_tpu.ops import layer as layer_ops
            gate = self._fused_gate(x, train)
            if gate is not None:
                params, kwargs = gate
                # row L-1 of the additive mask is exactly the key-padding
                # additive row (the causal triangle allows all keys there)
                madd = attn_mask[:, 0, -1, :].astype(jnp.float32)
                y = layer_ops.fused_last_query_layer(x, madd, params,
                                                     **kwargs)
                return y[:, None, :]
        if self.fused_layer and not special and not self.qkv_packed:
            from unirec_tpu.ops import layer as layer_ops
            gate = self._fused_gate(x, train)
            if gate is not None:
                params, kwargs = gate
                madd = attn_mask[:, 0, -1, :].astype(jnp.float32)
                return layer_ops.fused_transformer_layer(
                    x, madd, params, causal=self.fused_causal, **kwargs)
        x = MultiHeadAttention(self.n_heads, self.hidden_size,
                               self.hidden_dropout_prob, self.attn_dropout_prob,
                               self.layer_norm_eps, self.kernel_init,
                               self.use_flash and not special,
                               self.use_fused and not special,
                               self.dtype,
                               self.direct_layout and not special,
                               self.bits8, self.qkv_packed, self.last_query,
                               self.head_stacked, self.mask_remat,
                               name="multi_head_attention")(x, attn_mask, train)
        return FeedForward(self.hidden_size, self.inner_size,
                           self.hidden_dropout_prob, self.hidden_act,
                           self.layer_norm_eps, self.kernel_init, self.dtype,
                           self.bits8, self.fused_ffn, self.mask_remat,
                           name="feed_forward")(x, train)


class TransformerEncoder(nn.Module):
    n_layers: int = 2
    n_heads: int = 2
    hidden_size: int = 64
    inner_size: int = 256
    hidden_dropout_prob: float = 0.5
    attn_dropout_prob: float = 0.5
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    kernel_init: Callable = nn.initializers.normal(0.02)
    use_flash: bool = False
    use_fused: bool = False
    dtype: Any = None
    direct_layout: bool = False
    # rematerialize each layer in backward: the step is HBM-bound at ~2% MFU
    # (docs/performance_notes.md), so recomputing the [B, H, L, L]
    # softmax/dropout intermediates is nearly free in FLOPs and removes their
    # autodiff residual traffic. Opt-in pending TPU A/B
    # (bench/bench_step_variants.py).
    remat: bool = False
    bits8: bool = False
    qkv_packed: bool = False
    # compute the FINAL layer for only the last query position (output
    # becomes [B, 1, H]). Valid exactly when the consumer reads only the
    # final position of the encoder output (left-padded sequences; SASRec's
    # forward_user_emb, sasrec.py:59-76). Earlier layers still run full-length
    # — their outputs are the last layer's keys/values. Removes the final
    # layer's [B, H, L, L] attention-core traffic and shrinks its FFN by L.
    last_query_only: bool = False
    # all-heads-in-one-matmul attention (MultiHeadAttention.head_stacked):
    # kills the per-head 4-D tensors' 2.9-4.4x tile padding at short L.
    # Applied to every layer (composes with last_query_only on the final
    # one). Opt-in, measured lever.
    head_stacked: bool = False
    # Pallas fused dense->act->dense FFN (ops/ffn.py): the [tokens,
    # inner_size] activation never round-trips HBM. Opt-in, measured lever.
    fused_ffn: bool = False
    # store NO dropout masks between fwd/bwd: regenerate the byte mask in
    # backward from the rng key (Dropout8.remat). Same masks, same loss;
    # bits8 path only. Opt-in, measured lever (config dropout_mask_remat=1).
    mask_remat: bool = False
    # whole-layer Pallas kernel per full-length layer (ops/layer.py) —
    # composes with last_query_only (the single-query final layer keeps its
    # own cheap path). Opt-in, measured lever (config fused_layer=1).
    fused_layer: bool = False
    fused_causal: bool = True
    # single-query final layer as a Pallas kernel too (config fused_lastq=1;
    # needs last_query_only) — K/V and head views stay in VMEM
    fused_lastq: bool = False

    @nn.compact
    def __call__(self, x, attn_mask, train: bool):
        if (self.fused_layer and self.fused_lastq and self.last_query_only
                and not (self.remat or self.head_stacked or self.qkv_packed
                         or self.fused_ffn)):
            # padded fused chain: with EVERY layer a Pallas kernel, pad the
            # sequence dim to the kernels' sublane multiple ONCE and keep it
            # padded between layers — the per-layer pad(fwd)/slice(bwd)
            # pairs the kernels would otherwise emit (~1.4 ms each at bench
            # shapes) disappear. Fake rows hold zeros, are banned as keys by
            # the -1e30 madd tail, and their (finite) outputs are never
            # consumed: the final layer reads only real row L-1.
            from unirec_tpu.ops import layer as layer_ops
            drop_on = train and (self.attn_dropout_prob > 0.0
                                 or self.hidden_dropout_prob > 0.0)
            if layer_ops.fused_layer_supported(x, self.hidden_act,
                                               self.n_heads,
                                               self.inner_size) \
                    and not (drop_on and layer_ops._INTERPRET):
                B, L, D = x.shape
                madd = attn_mask[:, 0, -1, :].astype(jnp.float32)
                xp, mp, Lp = layer_ops._pad_L(x, madd, L)
                common = dict(n_heads=self.n_heads,
                              inner_size=self.inner_size,
                              hidden_act=self.hidden_act,
                              layer_norm_eps=self.layer_norm_eps,
                              p_attn=self.attn_dropout_prob,
                              p_hidden=self.hidden_dropout_prob,
                              train=train)
                for i in range(self.n_layers):
                    params = _LayerParams(self.hidden_size, self.inner_size,
                                          self.kernel_init,
                                          name=f"layer_{i}")()
                    rng = self.make_rng("dropout") if drop_on else None
                    if i == self.n_layers - 1:
                        y = layer_ops.fused_last_query_layer(
                            xp, mp, params, q_index=L - 1,
                            dropout_rng=rng, **common)
                        return y[:, None, :]
                    xp = layer_ops.fused_transformer_layer(
                        xp, mp, params, causal=self.fused_causal,
                        dropout_rng=rng, **common)
        layer_cls = TransformerLayer
        if self.remat:
            # train is a static bool (it selects the dropout branch)
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        for i in range(self.n_layers):
            last_q = self.last_query_only and i == self.n_layers - 1
            x = layer_cls(self.n_heads, self.hidden_size, self.inner_size,
                          self.hidden_dropout_prob, self.attn_dropout_prob,
                          self.hidden_act, self.layer_norm_eps,
                          self.kernel_init, self.use_flash,
                          self.use_fused, self.dtype, self.direct_layout,
                          self.bits8, self.qkv_packed, last_q,
                          self.head_stacked, self.fused_ffn, self.mask_remat,
                          self.fused_layer, self.fused_causal,
                          fused_lastq=self.fused_lastq,
                          name=f"layer_{i}")(x, attn_mask, train)
        return x


def causal_attention_mask(item_seq: jnp.ndarray, bidirectional: bool = False) -> jnp.ndarray:
    """Additive mask [B,1,L,L]: -10000 where attention is forbidden
    (sasrec.py:40-57). Padding positions (id 0) are masked as keys; a causal
    triangle is applied unless bidirectional."""
    B, L = item_seq.shape
    pad = (item_seq > 0).astype(jnp.float32)[:, None, None, :]  # [B,1,1,L]
    mask = pad
    if not bidirectional:
        causal = jnp.tril(jnp.ones((L, L), dtype=jnp.float32))[None, None]
        mask = mask * causal
    return (1.0 - mask) * MASK_VALUE


class Dice(nn.Module):
    """Dice activation (modules.py:135-153): f(s) = p·s + (1-p)·α·s with
    p = sigmoid(s). The reference keeps α as a non-learnable zero buffer
    (making Dice equal to sigmoid-gating); here α is a zero-initialized
    *parameter* so the adaptive part is actually trainable."""

    emb_size: int

    @nn.compact
    def __call__(self, score: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (self.emb_size,))
        p = jax.nn.sigmoid(score)
        return alpha * (1.0 - p) * score + p * score


class SequenceAttLayer(nn.Module):
    """DIN-style target attention over the user history
    (modules.py:155-225): queries are candidate items [B, T, H], keys the
    history [B, L, H]; invalid (left-pad) key positions get score 0.0 before
    the softmax — the reference's mask value, kept verbatim."""

    input_size: int
    output_size: int
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, queries: jnp.ndarray, keys: jnp.ndarray,
                 keys_length: jnp.ndarray) -> jnp.ndarray:
        H = queries.shape[-1]
        dense = lambda name: nn.Dense(self.output_size, use_bias=False,
                                      kernel_init=self.kernel_init, name=name)
        q = dense("dense_1")(queries)
        k = dense("dense_2")(keys)
        att = jnp.einsum("bth,blh->btl", q, k)
        L = keys.shape[1]
        # left-padded: position l is invalid when l < L - keys_length
        idx = jnp.arange(L)[None, :]
        invalid = idx < (L - keys_length[:, None])            # [B, L]
        att = jnp.where(invalid[:, None, :], 0.0, att)
        att = jax.nn.softmax(att / jnp.sqrt(float(H)), axis=-1)
        return jnp.einsum("btl,blh->bth", att, keys)


# ------------------------------------------------------- AdaRanker machinery
# torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on the weight is
# U(±1/sqrt(fan_in)); bias is U(±1/sqrt(fan_in)) as well (modules.py:516-521).
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class NeuProcessEncoder(nn.Module):
    """Neural-process set encoder producing the per-request distribution
    vector z (modules.py:445-498): per-element MLP → mean-pool over the set →
    reparameterized z. The reference draws the reparameterization noise
    unconditionally; here noise is drawn from the 'dropout' rng stream during
    training and z=mu at evaluation (deterministic serving)."""

    input_size: int = 64
    hidden_size: int = 64
    output_size: int = 64
    dropout_prob: float = 0.4
    # True → the reference's exact torch-default init for the log-sigma head
    # (adaranker.py:192-196 / modules.py:445-498), giving initial std≈1;
    # False (default) → bias -8 (std≈0.02), see the comment below.
    reference_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dense = lambda d, name: nn.Dense(d, kernel_init=torch_linear_kernel_init,
                                         bias_init=nn.initializers.zeros, name=name)
        h = dense(self.hidden_size, "input_hidden")(x)
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        h = jax.nn.relu(h)
        h = dense(self.output_size, "input_out")(h)
        z = jnp.mean(h, axis=-2)                       # aggregate over the set
        h2 = jax.nn.relu(dense(self.hidden_size, "z_to_hidden")(z))
        mu = dense(self.output_size, "hidden_to_mu")(h2)
        # log-sigma bias starts at -8 (initial std≈0.02, the embedding
        # scale): the reference's zero-bias init gives std≈1, which makes the
        # FiLM shift derived from z ~50x larger than the item embeddings and
        # (for encoders without an input LayerNorm, e.g. the GRU backbone)
        # drowns the history signal entirely; a small learnable initial std
        # preserves the stochastic design without that failure mode
        logsig_bias = (torch_linear_bias_init(self.hidden_size)
                       if self.reference_init
                       else nn.initializers.constant(-8.0))
        log_sigma = nn.Dense(self.output_size,
                             kernel_init=torch_linear_kernel_init,
                             bias_init=logsig_bias,
                             name="hidden_to_logsigma")(h2)
        if train:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            return mu + eps * jnp.exp(0.5 * log_sigma)
        return mu


class MemoryUnit(nn.Module):
    """Parameter-memory network (modules.py:592-620): K base parameter
    blocks, combined per request by attention of z over learned keys.
    Returns [B, out, in] parameter patches."""

    input_size: int
    output_size: int
    emb_size: int
    clusters_k: int = 10
    # 'one' → patches start as identity scaling (the modulated layer behaves
    # like its unpatched self at init, modulation is learned); 'xavier' is
    # the reference init (modules.py:597), which multiplicatively shrinks the
    # patched weights ~10x at init and starves them of gradient signal.
    init_center: str = "one"

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.init_center == "one":       # multiplicative (weight) patches
            array_init = lambda key, shape, dtype=jnp.float32: \
                1.0 + 0.05 * jax.random.normal(key, shape, dtype)
        elif self.init_center == "zero":    # additive (bias) patches
            array_init = nn.initializers.normal(0.05)
        else:
            array_init = nn.initializers.glorot_uniform()
        array = self.param("array", array_init,
                           (self.clusters_k, self.input_size * self.output_size))
        index = self.param("index", nn.initializers.glorot_uniform(),
                           (self.clusters_k, self.emb_size))
        att = jax.nn.softmax(z @ index.T, axis=-1)            # [B, K]
        para = att @ array                                    # [B, in*out]
        return para.reshape(-1, self.output_size, self.input_size)


class AdaLinear(nn.Module):
    """Linear layer modulated by per-request parameter patches
    (modules.py:500-589 memory_parameters path): weight_new =
    patch ⊙ weight (elementwise, broadcast over batch), bias_new =
    bias_patch + bias."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mem_w: Optional[jnp.ndarray] = None,
                 mem_b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        weight = self.param("weight", torch_linear_kernel_init,
                            (self.in_features, self.out_features))
        bias = self.param("bias", torch_linear_bias_init(self.in_features),
                          (self.out_features,))
        if mem_w is None:
            return x @ weight + bias
        # mem_w: [B, out, in]; x: [B, ..., in]
        w_new = mem_w.transpose(0, 2, 1) * weight[None]       # [B, in, out]
        out = jnp.einsum("b...i,bio->b...o", x, w_new)
        b_new = bias[None]
        if mem_b is not None:
            b_new = b_new + mem_b[..., 0]                     # [B, out]
        return out + b_new[:, None, :] if out.ndim == 3 else out + b_new


class ModulateHidden(nn.Module):
    """Per-request generated square weight applied to the hidden state
    (modules.py:623-641)."""

    input_size: int
    emb_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        gen = nn.Dense(self.input_size * self.input_size,
                       kernel_init=torch_linear_kernel_init,
                       bias_init=nn.initializers.zeros, name="gen_para_layer")
        w = gen(z).reshape(-1, self.input_size, self.input_size)
        return jnp.einsum("b...i,boi->b...o", x, w)


class MMoEUnit(nn.Module):
    """Mixture-of-experts parameter generator (modules.py:700-731): softmax
    gate over expert parameter blocks keyed on z."""

    input_size: int
    output_size: int
    emb_size: int
    expert_num: int = 10

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if z.ndim == 3:
            z = z[:, 0]
        weight = self.param("weight", torch_linear_kernel_init,
                            (self.expert_num, self.output_size * self.input_size))
        gate = nn.Dense(self.expert_num, use_bias=False,
                        kernel_init=torch_linear_kernel_init, name="gate_net")
        att = jax.nn.softmax(gate(z), axis=-1)
        return (att @ weight).reshape(-1, self.output_size, self.input_size)


class AttentionMergeLayer(nn.Module):
    """Learned attention pooling over the sequence (modules.py:226-244)."""

    input_size: int
    dropout: float
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, seq_emb: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.Dense(self.input_size, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros, name="dense")(seq_emb)
        # `h` attention vector is a raw randn parameter in the reference
        att_vec = self.param("h", nn.initializers.normal(1.0), (self.input_size, 1))
        scores = jax.nn.softmax((h @ att_vec)[..., 0], axis=-1)  # [B, L]
        out = jnp.einsum("bl,bld->bd", scores, h)
        return nn.Dropout(self.dropout, deterministic=not train)(out)
