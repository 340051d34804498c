"""Sequential (history-conditioned) retrieval models.

TPU-native re-implementations of the reference's
unirec/model/sequential/*.py family. All consume left-padded ``item_seq``
[B, L] (most recent item at position L-1) and emit a user embedding [B, D].
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirec_tpu.models import modules
from unirec_tpu.models.base import SeqRecBase
from unirec_tpu.utils.registry import register_model


@register_model("SASRec")
class SASRec(SeqRecBase):
    """Self-attentive sequential recommender (sasrec.py:10-77): item+position
    embedding → LN → dropout → N× post-LN transformer with causal -10000
    mask → hidden state at the last position."""

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        self.use_pos_emb = bool(c.get("use_position_emb", True))
        if self.use_pos_emb:
            # +1 slot for consistency with ranking models (sasrec.py:25)
            self.position_embedding = nn.Embed(int(c["max_seq_len"]) + 1,
                                               self.hidden_size,
                                               embedding_init=init,
                                               dtype=self.compute_dtype,
                                               name="position_embedding")
        self.trm_encoder = modules.TransformerEncoder(
            n_layers=int(c.get("n_layers", 2)),
            n_heads=int(c.get("n_heads", 2)),
            hidden_size=self.hidden_size,
            inner_size=int(c.get("inner_size", 256)),
            hidden_dropout_prob=float(c.get("hidden_dropout_prob", 0.5)),
            attn_dropout_prob=float(c.get("attn_dropout_prob", 0.5)),
            hidden_act=c.get("hidden_act", "gelu"),
            layer_norm_eps=float(c.get("layer_norm_eps", 1e-12)),
            kernel_init=init,
            use_flash=bool(c.get("use_pallas", True)),
            use_fused=bool(c.get("use_fused_attention", 0)),
            dtype=self.compute_dtype,
            direct_layout=bool(c.get("attn_direct_layout", 0)),
            remat=bool(c.get("remat_attention", 0)),
            bits8=int(c.get("dropout_bits", 32)) == 8,
            qkv_packed=bool(c.get("qkv_packed", 0)),
            # SASRec reads ONLY the final position (forward_user_emb below),
            # so with `last_query_only=1` the final layer runs single-query:
            # same math per consumed element (eval-parity tested), −33% step
            # time at bench shapes. Opt-in like the other measured levers
            # (dropout_bits/rbg): it draws the dropout stream differently,
            # so fixed-seed training trajectories change.
            last_query_only=bool(c.get("last_query_only", 0)),
            # all-heads-in-one-matmul attention (modules.py head_stacked):
            # avoids the per-head tensors' short-L tile padding; opt-in
            head_stacked=bool(c.get("attn_head_stacked", 0)),
            # Pallas dense->act->dense FFN (ops/ffn.py): [T, inner] stays in
            # VMEM instead of two HBM round-trips; same params/math, opt-in
            fused_ffn=bool(c.get("use_fused_ffn", 0)),
            # regenerate dropout byte masks in backward instead of storing
            # them (modules.Dropout8.remat); same masks/loss, opt-in
            mask_remat=bool(c.get("dropout_mask_remat", 0)),
            # whole-layer Pallas kernel (ops/layer.py): one program per
            # batch block runs qkv→attention→proj→LN→FFN→LN with nothing
            # but x/y touching HBM. Opt-in, measured lever
            fused_layer=bool(c.get("fused_layer", 0)),
            fused_causal=self.use_pos_emb,
            # single-query final layer as a Pallas kernel too (needs
            # last_query_only; ops/layer.py::fused_last_query_layer)
            fused_lastq=bool(c.get("fused_lastq", 0)))
        self.input_ln = nn.LayerNorm(epsilon=float(c.get("layer_norm_eps", 1e-12)),
                                     dtype=self.compute_dtype, name="LayerNorm")
        if int(c.get("dropout_bits", 32)) == 8:
            self.input_dropout = modules.Dropout8(
                float(c.get("hidden_dropout_prob", 0.5)),
                remat=bool(c.get("dropout_mask_remat", 0)))
        else:
            self.input_dropout = nn.Dropout(
                float(c.get("hidden_dropout_prob", 0.5)))

    def encode_sequence(self, item_seq, item_seq_features=None, time_seq=None,
                        train: bool = False):
        x = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        if self.use_pos_emb:
            pos_ids = jnp.arange(item_seq.shape[1], dtype=jnp.int32)
            # cast so the add doesn't re-promote the bf16 sequence to f32
            x = x + self._cast(self.position_embedding(pos_ids))[None]
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=not train)
        mask = modules.causal_attention_mask(item_seq, bidirectional=not self.use_pos_emb)
        return self.trm_encoder(x, mask, train)

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        h = self.encode_sequence(item_seq, item_seq_features, time_seq, train)
        return h[:, -1, :]


@register_model("GRU")
class GRU(SeqRecBase):
    """GRU4Rec-style encoder (gru.py:13-35): 1-layer GRU → dense → last
    hidden. Left padding makes the last position the freshest item."""

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        self.emb_dropout = nn.Dropout(float(c.get("dropout_prob", 0.0)))
        self.gru = nn.RNN(nn.GRUCell(features=self.hidden_size), name="gru_layers")
        self.dense = nn.Dense(self.emb_dim, kernel_init=init,
                              bias_init=nn.initializers.zeros, name="dense")

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        x = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        x = self.emb_dropout(x, deterministic=not train)
        h = self.gru(x)
        h = self.dense(h)
        return h[:, -1]


@register_model("AvgHist")
class AvgHist(SeqRecBase):
    """(len+1)^-alpha scaled history sum (avghist.py:16-55); optionally
    asymmetric src/dst item tables."""

    def _define_model_layers(self):
        init = self._init_fn()
        if self.cfg.get("asymmetric"):
            self.item_dst_embedding = nn.Embed(
                self.n_items, self.emb_dim,
                embedding_init=lambda k, s, d=jnp.float32: modules.zero_pad_row(init(k, s, d)),
                dtype=self.compute_dtype,
                name="item_dst_embedding")
        self.alpha = float(self.cfg.get("user_sequence_alpha", 0.5))

    def _dst_table(self):
        return self.item_dst_embedding if self.cfg.get("asymmetric") else self.item_embedding

    def item_embedding_for_user(self, item_seq, item_seq_features=None, time_seq=None):
        e = self._masked_gather(self._dst_table(), item_seq)
        if self.cfg.get("use_features") and item_seq_features is not None:
            e = e + self._features_emb(item_seq_features)
        if int(self.cfg.get("time_seq", 0)) and time_seq is not None:
            e = e + self._masked_gather(self.time_embedding, time_seq)
        if self.cfg.get("use_text_emb"):
            e = e + self._text_emb(item_seq)
        return e

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        e = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        coeff = jnp.power((item_seq_len + 1).astype(jnp.float32), -self.alpha)[:, None]
        return coeff * e.sum(1)


@register_model("AttHist")
class AttHist(SeqRecBase):
    """Learned attention pooling over the history (atthist.py:13-22)."""

    def _define_model_layers(self):
        self.attention = modules.AttentionMergeLayer(
            self.emb_dim, float(self.cfg.get("dropout_prob", 0.0)),
            kernel_init=self._init_fn())

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        e = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        return self.attention(e, train)


@register_model("SVDPlusPlus")
class SVDPlusPlus(SeqRecBase):
    """user emb + alpha-scaled sum of a separate dst item table
    (svdplusplus.py:17-39)."""

    def _define_model_layers(self):
        init = self._init_fn()
        self.item_dst_embedding = nn.Embed(
            self.n_items, self.emb_dim,
            embedding_init=lambda k, s, d=jnp.float32: modules.zero_pad_row(init(k, s, d)),
            dtype=self.compute_dtype,
            name="item_dst_embedding")
        self.alpha = float(self.cfg.get("user_sequence_alpha", 0.5))

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        u = self._masked_gather(self.user_embedding, user_id)
        h = self._masked_gather(self.item_dst_embedding, item_seq)
        coeff = jnp.power((item_seq_len + 1).astype(jnp.float32), -self.alpha)[:, None]
        return u + coeff * h.sum(1)


class _ConvFFN(nn.Module):
    """Intermediate FFN shared by ConvFormer variants (convformer.py:104-118)."""

    hidden_size: int
    inner_size: int
    hidden_act: str
    hidden_dropout_prob: float
    layer_norm_eps: float
    kernel_init: Any

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Dense(self.inner_size, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros)(x)
        h = modules.ACT2FN[self.hidden_act](h)
        h = nn.Dense(self.hidden_size, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros)(h)
        h = nn.Dropout(self.hidden_dropout_prob, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(h + x)


class _DepthwiseConvLayer(nn.Module):
    """Depthwise Conv1d token mixer with circular/reflect/constant left
    padding (convformer.py:70-103)."""

    conv_size: int
    padding_mode: str
    hidden_dropout_prob: float
    hidden_size: int
    layer_norm_eps: float
    init_ratio: float

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [B, L, H]; depthwise kernel [K, H]
        kernel = self.param("conv_kernel", nn.initializers.normal(self.init_ratio),
                            (self.conv_size, self.hidden_size))
        bias = self.param("conv_bias", nn.initializers.normal(self.init_ratio),
                          (self.hidden_size,))
        pad = self.conv_size - 1
        if self.padding_mode == "circular":
            xp = jnp.concatenate([x[:, -pad:, :], x], axis=1) if pad else x
        elif self.padding_mode == "reflect":
            xp = jnp.concatenate([jnp.flip(x, axis=1)[:, :pad, :], x], axis=1) if pad else x
        else:  # constant
            xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        # valid depthwise conv: windows of length K ending at each position
        idx = jnp.arange(x.shape[1])[:, None] + jnp.arange(self.conv_size)[None, :]
        windows = xp[:, idx, :]                       # [B, L, K, H]
        h = jnp.einsum("blkh,kh->blh", windows, kernel) + bias
        h = nn.Dropout(self.hidden_dropout_prob, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(h + x)


class _SpectralConvLayer(nn.Module):
    """rFFT ∘ pointwise-mul ∘ irFFT spectral convolution
    (fastconvformer.py:47-61)."""

    conv_size: int
    hidden_dropout_prob: float
    hidden_size: int
    layer_norm_eps: float
    max_seq_len: int

    @nn.compact
    def __call__(self, x, train: bool):
        weight = self.param("conv_weight", nn.initializers.normal(0.02),
                            (1, self.conv_size, self.hidden_size))
        L = x.shape[1]
        w = jnp.concatenate(
            [weight, jnp.zeros((1, self.max_seq_len - self.conv_size, self.hidden_size))],
            axis=1)[:, :L]
        xf = jnp.fft.rfft(x, axis=1, norm="ortho")
        wf = jnp.fft.rfft(w, axis=1, norm="ortho")
        h = jnp.fft.irfft(xf * wf, n=L, axis=1, norm="ortho").astype(x.dtype)
        h = nn.Dropout(self.hidden_dropout_prob, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(h + x)


class _ConvFormerBase(SeqRecBase):
    spectral: bool = False

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        self.position_embedding = nn.Embed(int(c["max_seq_len"]), self.hidden_size,
                                           embedding_init=init,
                                           dtype=self.compute_dtype,
                                           name="position_embedding")
        eps = float(c.get("layer_norm_eps", 1e-9))
        n_layers = int(c.get("n_layers", 2))
        mixers, ffns = [], []
        for i in range(n_layers):
            if self.spectral:
                mixers.append(_SpectralConvLayer(int(c["conv_size"]),
                                                 float(c.get("hidden_dropout_prob", 0.5)),
                                                 self.hidden_size, eps,
                                                 int(c["max_seq_len"]),
                                                 name=f"mixer_{i}"))
            else:
                mixers.append(_DepthwiseConvLayer(int(c["conv_size"]),
                                                  c.get("padding_mode", "circular"),
                                                  float(c.get("hidden_dropout_prob", 0.5)),
                                                  self.hidden_size, eps,
                                                  float(c.get("init_ratio", 5e-3)),
                                                  name=f"mixer_{i}"))
            ffns.append(_ConvFFN(self.hidden_size, int(c.get("inner_size", 256)),
                                 c.get("hidden_act", "gelu"),
                                 float(c.get("hidden_dropout_prob", 0.5)), eps,
                                 init, name=f"ffn_{i}"))
        self.mixers, self.ffns = mixers, ffns
        self.input_ln = nn.LayerNorm(epsilon=eps, name="LayerNorm")
        self.input_dropout = nn.Dropout(float(c.get("hidden_dropout_prob", 0.5)))

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        c = self.cfg
        x = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        pos_ids = jnp.arange(item_seq.shape[1], dtype=jnp.int32)
        x = x + self._cast(self.position_embedding(pos_ids))[None]
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=not train)
        for mixer, ffn in zip(self.mixers, self.ffns):
            x = mixer(x, train)
            x = ffn(x, train)
        if c.get("seq_merge"):
            # log-decay weighted pooling (convformer.py:62-67)
            L = int(c["max_seq_len"])
            decay = jnp.logspace(float(c.get("seq_decay", -0.3)), 0.0, num=L)
            nz = (item_seq_len[:, None] + 1).astype(jnp.float32)
            return (x * decay[None, :, None]).sum(1) / jnp.sqrt(nz)
        return x[:, -1, :]


@register_model("ConvFormer")
class ConvFormer(_ConvFormerBase):
    """Depthwise-conv token mixer ConvFormer (arXiv:2308.02925;
    convformer.py)."""
    spectral: bool = False


@register_model("FASTConvFormer")
class FASTConvFormer(_ConvFormerBase):
    """Spectral-convolution ConvFormer — same op as ConvFormer expressed as
    FFT pointwise multiply (fastconvformer.py)."""
    spectral: bool = True
