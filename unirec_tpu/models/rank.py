"""Ranking (CTR / re-ranking) models: FM, BST, AdaRanker.

TPU-native re-implementations of the reference's unirec/model/rank/*.py on
top of the Ranker protocol (base/ranker.py:9-37): ``forward_scores(batch)``
produces pointwise or grouped logits, the shared ``__call__`` turns them
into a loss. All shapes are static; the group dimension comes from the
data (T4 item/label groups, T7 grouped libFM rows) rather than dynamic
negative sampling.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unirec_tpu.models import modules
from unirec_tpu.models.base import BaseRecommender
from unirec_tpu.ops import losses as L
from unirec_tpu.utils.registry import register_model


class RankerBase(BaseRecommender):
    """Pointwise/groupwise scoring base (ranker.py:9-37): models emit scores
    for the given items; there is no user/item two-tower split."""

    def forward_scores(self, batch, train: bool = False):
        raise NotImplementedError

    def _clip(self, scores):
        clip = float(self.cfg.get("score_clip_value", -1) or -1)
        if clip > 0:
            scores = jnp.clip(scores, -clip, clip)
        return scores

    def __call__(self, batch, train: bool = True):
        weight = batch.get("weight")
        scores = self._clip(self.forward_scores(batch, train=train))
        label = batch.get("label")
        if weight is None:
            weight = jnp.ones(scores.shape[0], jnp.float32)
        group = int(self.cfg.get("group_size", -1) or -1)
        if group > 0 and scores.ndim == 1:
            scores = scores.reshape(-1, group)
            label = label.reshape(-1, group) if label is not None else None
        return L.compute_loss(self.loss_type, scores, label, weight, self.cfg)

    def predict(self, batch):
        return self._clip(self.forward_scores(batch, train=False))

    # rankers have no retrieval towers; the full-catalog paths are unused
    def forward_user_emb(self, *a, **k):  # pragma: no cover
        raise NotImplementedError("rankers do not expose user embeddings")


@register_model("FM")
class FM(RankerBase):
    """Factorization machine over sparse libFM features (fm.py:73-152).

    First order: gathered linear weights (the reference's four SparseLinear
    modes — gather/full/sparse/embedding, fm.py:15-70 — are all the same
    math; on TPU every mode lowers to the 'gather' formulation, which is the
    one the reference calls fastest). Second order: 0.5·(square-of-sum −
    sum-of-squares) over value-scaled feature embeddings (fm.py:99-110).
    ``predict`` applies the sigmoid (fm.py:128-131).
    """

    use_item_emb: bool = False

    @property
    def n_feats(self) -> int:
        return int(self.cfg["n_feats"])

    def _define_model_layers(self):
        self.fm_linear_weight = self.param(
            "fm_linear_weight", nn.initializers.zeros, (self.n_feats,))
        self.fm_linear_bias = self.param(
            "fm_linear_bias", nn.initializers.zeros, (1,))
        self.fm_embedding = nn.Embed(
            self.n_feats, self.emb_dim,
            embedding_init=lambda k, s, d=jnp.float32: modules.zero_pad_row(
                nn.initializers.normal(0.01)(k, s, d)),
            name="fm_embedding")

    def forward_scores(self, batch, train: bool = False):
        index_list = batch["index_list"].astype(jnp.int32)
        value_list = batch["value_list"].astype(jnp.float32)
        grouped = index_list.ndim == 3
        if grouped:
            B, G, F = index_list.shape
            index_list = index_list.reshape(B * G, F)
            value_list = value_list.reshape(B * G, F)

        w = self.fm_linear_weight[index_list]                  # [N, F]
        linear = jnp.sum(w * value_list, axis=-1) + self.fm_linear_bias[0]

        emb = self.fm_embedding(index_list) * (index_list != 0)[..., None]
        prod = emb * value_list[..., None]                     # [N, F, D]
        sum_sq = jnp.sum(prod ** 2, axis=1)
        sq_sum = jnp.sum(prod, axis=1) ** 2
        second = 0.5 * jnp.sum(sq_sum - sum_sq, axis=-1)

        scores = linear + second
        return scores.reshape(B, G) if grouped else scores

    def predict(self, batch):
        return jax.nn.sigmoid(self._clip(self.forward_scores(batch)))


def load_xlearn_fm(path: str, n_feats: int, emb_dim: int):
    """Parse an xlearn text FM checkpoint into an FM param tree
    (fm.py:133-152): line 0 = bias, next n_feats lines = linear weights,
    remaining = embedding rows of width emb_dim."""
    with open(path) as f:
        lines = f.readlines()
    bias = float(lines[0].strip().split(": ")[1])
    weight = np.asarray([float(l.strip().split(": ")[1])
                         for l in lines[1:n_feats + 1]], np.float32)
    emb = np.asarray([[float(v) for v in l.strip().split(": ")[1].split()]
                      for l in lines[n_feats + 1:]], np.float32)
    assert emb.shape == (n_feats, emb_dim), emb.shape
    return {
        "fm_linear_bias": np.asarray([bias], np.float32),
        "fm_linear_weight": weight,
        "fm_embedding": {"embedding": emb},
    }


@register_model("BST")
class BST(RankerBase):
    """Behavior Sequence Transformer (bst.py:10-104): the candidate item is
    appended to the history sequence, encoded with a bidirectional
    transformer (padding-only mask), pooled with log-decay weights scaled by
    1/sqrt(len+1), and scored by a 2-layer MLP head. Grouped candidates
    broadcast the history over the group (bst.py:58-66)."""

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        L_ = int(c["max_seq_len"])
        self.position_embedding = nn.Embed(L_ + 1, self.hidden_size,
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
            layer_norm_eps=float(c.get("layer_norm_eps", 1e-10)),
            kernel_init=init,
            use_flash=bool(c.get("use_pallas", True)),
            use_fused=bool(c.get("use_fused_attention", 0)),
            dtype=self.compute_dtype,
            direct_layout=bool(c.get("attn_direct_layout", 0)),
            remat=bool(c.get("remat_attention", 0)),
            bits8=int(c.get("dropout_bits", 32)) == 8,
            fused_ffn=bool(c.get("use_fused_ffn", 0)),
            mask_remat=bool(c.get("dropout_mask_remat", 0)))
        self.input_ln = nn.LayerNorm(epsilon=float(c.get("layer_norm_eps", 1e-10)),
                                     name="LayerNorm")
        self.input_dropout = nn.Dropout(float(c.get("hidden_dropout_prob", 0.5)))
        self.head_dense1 = nn.Dense(self.hidden_size, kernel_init=init,
                                    bias_init=nn.initializers.zeros,
                                    name="output_dense1")
        self.head_dense2 = nn.Dense(1, kernel_init=init,
                                    bias_init=nn.initializers.zeros,
                                    name="output_dense2")
        self.seq_decay = float(c.get("seq_decay", -0.3))

    def forward_scores(self, batch, train: bool = False):
        item_id = batch["item_id"]
        item_seq = batch["item_seq"]
        item_seq_len = batch["item_seq_len"]
        item_features = batch.get("item_features")
        item_seq_features = batch.get("item_seq_features")

        grouped = item_id.ndim == 2
        if grouped:
            B, G = item_id.shape
            Ls = item_seq.shape[1]
            item_id = item_id.reshape(-1)
            item_seq = jnp.broadcast_to(item_seq[:, None, :], (B, G, Ls)).reshape(-1, Ls)
            item_seq_len = jnp.broadcast_to(item_seq_len[:, None], (B, G)).reshape(-1)
            if item_features is not None:
                item_features = item_features.reshape(-1, item_features.shape[-1])
            if item_seq_features is not None:
                F_ = item_seq_features.shape[-1]
                item_seq_features = jnp.broadcast_to(
                    item_seq_features[:, None], (B, G, Ls, F_)).reshape(-1, Ls, F_)

        item_emb = self.forward_item_emb(item_id, item_features)
        seq_emb = self.item_embedding_for_user(item_seq, item_seq_features)
        x = jnp.concatenate([seq_emb, item_emb[:, None, :]], axis=1)  # [N, L+1, D]
        new_seq = jnp.concatenate([item_seq, item_id[:, None]], axis=1)

        pos_ids = jnp.arange(new_seq.shape[1], dtype=jnp.int32)
        x = x + self._cast(self.position_embedding(pos_ids))[None]
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=not train)

        mask = modules.causal_attention_mask(new_seq, bidirectional=True)
        h = self.trm_encoder(x, mask, train)

        L_full = int(self.cfg["max_seq_len"]) + 1
        decay = jnp.logspace(self.seq_decay, 0.0, num=L_full)
        nz = (item_seq_len[:, None] + 1).astype(jnp.float32)
        pooled = (h * decay[None, :, None]).sum(1) / jnp.sqrt(nz)

        out = self.head_dense2(jax.nn.gelu(self.head_dense1(pooled),
                                           approximate=False))[..., 0]
        if self.cfg.get("has_item_bias"):
            out = out + self.item_bias[item_id]
        return out.reshape(B, G) if grouped else out


@register_model("AdaRanker")
class AdaRanker(RankerBase):
    """Data-distribution-adaptive ranker (adaranker.py:16-206,
    arXiv:2205.10775): a GRU or SASRec backbone whose input is FiLM-modulated
    by a distribution vector z extracted from the candidate set
    (NeuProcessEncoder), and whose 2-layer MLP scoring head receives
    per-request parameter patches generated by MemoryUnits keyed on z.
    ``train_type='Base'`` disables all modulation (adaranker.py:38-66)."""

    is_seqrec: bool = True

    @property
    def ada(self) -> bool:
        return self.cfg.get("train_type", "Ada-Ranker") == "Ada-Ranker"

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        D = self.emb_dim
        base = c.get("base_model", "GRU")
        if base == "GRU":
            self.gru_hidden = 2 * D
            self.emb_dropout = nn.Dropout(float(c.get("dropout_prob", 0.0)))
            self.gru = nn.RNN(nn.GRUCell(features=self.gru_hidden),
                              name="gru_layers")
            self.dense = nn.Dense(D, kernel_init=modules.torch_linear_kernel_init,
                                  bias_init=nn.initializers.zeros, name="dense")
        elif base == "SASRec":
            self.use_pos_emb = bool(c.get("use_position_emb", True))
            if self.use_pos_emb:
                self.position_embedding = nn.Embed(int(c["max_seq_len"]),
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
                # _encode_seq reads only [:, -1, :] (adaranker.py:104-121),
                # so the final layer can run single-query (see modules.py);
                # opt-in — changes the dropout stream (fixed-seed trajectories)
                last_query_only=bool(c.get("last_query_only", 0)),
                head_stacked=bool(c.get("attn_head_stacked", 0)),
                fused_ffn=bool(c.get("use_fused_ffn", 0)),
                mask_remat=bool(c.get("dropout_mask_remat", 0)))
            self.input_ln = nn.LayerNorm(
                epsilon=float(c.get("layer_norm_eps", 1e-12)), name="LayerNorm")
            self.input_dropout = nn.Dropout(float(c.get("hidden_dropout_prob", 0.5)))
        else:
            raise ValueError(f"unsupported AdaRanker base model: {base}")

        dnn_in, dnn_inner = 2 * D, D
        drop = float(c.get("dropout_prob", 0.0))
        self.mlp_dropout = nn.Dropout(drop)
        if self.ada:
            # Default init: FiLM starts at the identity transform (gamma=1,
            # beta=0) and weight/bias patches start at 1/0, so the Ada model
            # equals the Base model at init and learns the modulation — the
            # reference's zero-centered inits multiplicatively shrink the
            # modulated paths ~10-100x at init and starve them of gradient.
            # `ada_reference_init: 1` restores the reference's exact inits
            # (adaranker.py:192-206, modules.py:445-620: torch-default Dense
            # + xavier memory arrays) for apples-to-apples comparison runs.
            ref_init = bool(int(c.get("ada_reference_init", 0)))
            film_scale_bias = (modules.torch_linear_bias_init(D) if ref_init
                               else nn.initializers.ones)
            film_bias_bias = (modules.torch_linear_bias_init(D) if ref_init
                              else nn.initializers.zeros)
            mem_center = {"mem_w1": "one", "mem_b1": "zero",
                          "mem_w2": "one", "mem_b2": "zero"}
            if ref_init:
                mem_center = {k: "xavier" for k in mem_center}
            self.extract_distribution_layer = modules.NeuProcessEncoder(
                D, D, D, drop, reference_init=ref_init,
                name="extract_distribution_layer")
            self.film_scale = nn.Dense(1, kernel_init=modules.torch_linear_kernel_init,
                                       bias_init=film_scale_bias,
                                       name="film_affine_emb_scale")
            self.film_bias = nn.Dense(1, kernel_init=modules.torch_linear_kernel_init,
                                      bias_init=film_bias_bias,
                                      name="film_affine_emb_bias")
            self.mem_w1 = modules.MemoryUnit(dnn_in, dnn_inner, D,
                                             init_center=mem_center["mem_w1"],
                                             name="mem_w1")
            self.mem_b1 = modules.MemoryUnit(1, dnn_inner, D,
                                             init_center=mem_center["mem_b1"],
                                             name="mem_b1")
            self.mem_w2 = modules.MemoryUnit(dnn_inner, 1, D,
                                             init_center=mem_center["mem_w2"],
                                             name="mem_w2")
            self.mem_b2 = modules.MemoryUnit(1, 1, D,
                                             init_center=mem_center["mem_b2"],
                                             name="mem_b2")
            self.mlp1 = modules.AdaLinear(dnn_in, dnn_inner, name="mlp_1")
            self.mlp2 = modules.AdaLinear(dnn_inner, 1, name="mlp_2")
        else:
            self.mlp1 = nn.Dense(dnn_inner,
                                 kernel_init=modules.torch_linear_kernel_init,
                                 name="mlp_1")
            self.mlp2 = nn.Dense(1, kernel_init=modules.torch_linear_kernel_init,
                                 name="mlp_2")

    def _encode_seq(self, item_seq, seq_emb, train: bool):
        if self.cfg.get("base_model", "GRU") == "GRU":
            h = self.emb_dropout(seq_emb, deterministic=not train)
            h = self.gru(h)
            return self.dense(h)[:, -1]
        x = seq_emb
        if self.use_pos_emb:
            pos_ids = jnp.arange(item_seq.shape[1], dtype=jnp.int32)
            x = x + self._cast(self.position_embedding(pos_ids))[None]
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=not train)
        # causal triangle only with position embeddings (adaranker.py:104-121)
        mask = modules.causal_attention_mask(item_seq,
                                             bidirectional=not self.use_pos_emb)
        return self.trm_encoder(x, mask, train)[:, -1, :]

    def forward_scores(self, batch, train: bool = False):
        item_id = batch["item_id"]
        if item_id.ndim == 1:
            item_id = item_id[:, None]
        cand_emb = self._masked_gather(self.item_embedding, item_id)  # [B, G, D]

        z = None
        if self.ada:
            z = self.extract_distribution_layer(cand_emb, train=train)  # [B, D]

        seq_emb = self._masked_gather(self.item_embedding, batch["item_seq"])
        if self.ada:
            gamma = self.film_scale(z)[:, None, :]             # [B, 1, 1]
            beta = self.film_bias(z)[:, None, :]
            seq_emb = gamma * seq_emb + beta
        user = self._encode_seq(batch["item_seq"], seq_emb, train)    # [B, D]

        G = cand_emb.shape[1]
        h = jnp.concatenate(
            [jnp.broadcast_to(user[:, None, :], cand_emb.shape), cand_emb],
            axis=-1)                                           # [B, G, 2D]
        h = self.mlp_dropout(h, deterministic=not train)
        if self.ada:
            h = self.mlp1(h, self.mem_w1(z), self.mem_b1(z))
            h = jnp.tanh(h)
            h = self.mlp2(h, self.mem_w2(z), self.mem_b2(z))
        else:
            h = self.mlp2(jnp.tanh(self.mlp1(h)))
        scores = h[..., 0]                                     # [B, G]
        if batch["item_id"].ndim == 1:
            scores = scores[:, 0]
        return scores
