"""Base recommender modules (flax).

Functional re-design of the reference's class hierarchy
(reco_abc.py:60 AbstractRecommender → recommender.py:14 BaseRecommender):
models are flax Modules whose ``__call__(batch, train)`` returns
``(scalar_loss, per_row_loss)``; evaluation entry points are separate apply
methods (``predict``, ``user_emb``, ``all_item_emb``) so each can be jitted
into its own XLA program.

Conventions:
  - item/user id 0 is the padding id. Embedding gathers are masked with
    ``ids != 0`` which both zeroes the output and kills gradients to row 0 —
    the JAX equivalent of torch's ``padding_idx=0`` (reco_abc.py:167-170).
  - ``batch`` is a dict of fixed-shape arrays (see data/pipeline.py) with a
    per-row ``weight`` marking padded rows.
  - Frozen inputs (pretrained text embeddings, item→feature table) live in
    the 'constants' variable collection, excluded from the optimizer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirec_tpu.constants import DistanceType, LossType
from unirec_tpu.models import modules
from unirec_tpu.ops import losses as L


class BaseRecommender(nn.Module):
    cfg: Any  # plain dict of merged config

    # annotations used for routing (reference `annotations`, seqrec_base.py:25)
    is_seqrec: bool = False
    optimized_by_sgd: bool = True
    # FM replaces the item table with a feature table (fm.py:84 deletes
    # item_embedding)
    use_item_emb: bool = True

    # ------------------------------------------------------------- properties
    @property
    def n_users(self) -> int:
        return int(self.cfg["n_users"])

    @property
    def n_items(self) -> int:
        return int(self.cfg["n_items"])

    @property
    def emb_dim(self) -> int:
        return int(self.cfg.get("embedding_size", 32))

    @property
    def hidden_size(self) -> int:
        return int(self.cfg.get("hidden_size", self.emb_dim) or self.emb_dim)

    @property
    def loss_type(self) -> str:
        return self.cfg.get("loss_type", "bce")

    @property
    def compute_dtype(self):
        """Dense-tower computation dtype (params always fp32); bfloat16
        halves HBM traffic on the MXU path. Losses/metrics always run fp32."""
        return jnp.bfloat16 if self.cfg.get("compute_dtype") == "bfloat16" \
            else None

    def _init_fn(self):
        return modules.make_initializer(
            self.cfg.get("init_method", "normal"),
            float(self.cfg.get("init_mean", 0.0)),
            float(self.cfg.get("init_std", 0.02)))

    # ------------------------------------------------------------------ setup
    def setup(self):
        c = self.cfg
        init = self._init_fn()

        def padded_emb_init(key, shape, dtype=jnp.float32):
            return modules.zero_pad_row(init(key, shape, dtype))

        if c.get("has_user_emb"):
            self.user_embedding = nn.Embed(self.n_users, self.emb_dim,
                                           embedding_init=padded_emb_init,
                                           dtype=self.compute_dtype,
                                           name="user_embedding")
        if self.use_item_emb:
            pre_item = c.get("_pre_item_emb")
            if c.get("use_pre_item_emb") and pre_item is not None:
                item_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                    pre_item, dtype=dtype).reshape(shape)
            else:
                item_init = padded_emb_init
            # dtype: flax converts the [N, d] TABLE before the take, so the
            # gather reads/writes bf16 — casting after the gather measured
            # zero effect (XLA kept the f32 gather and fused the convert
            # into the LayerNorm that already did it)
            self.item_embedding = nn.Embed(self.n_items, self.emb_dim,
                                           embedding_init=item_init,
                                           dtype=self.compute_dtype,
                                           name="item_embedding")

        if c.get("has_user_bias"):
            self.user_bias = self.param("user_bias", nn.initializers.normal(0.1),
                                        (self.n_users,))
        if c.get("has_item_bias"):
            self.item_bias = self.param("item_bias", nn.initializers.normal(0.1),
                                        (self.n_items,))

        if c.get("use_text_emb"):
            text = c.get("_text_emb")
            tdim = int(c.get("text_emb_size", 768))
            self.text_embedding = self.variable(
                "constants", "text_embedding",
                lambda: jnp.asarray(text) if text is not None
                else jnp.zeros((self.n_items, tdim), jnp.float32))
            self.text_dense1 = nn.Dense(2 * self.emb_dim, kernel_init=init,
                                        bias_init=nn.initializers.zeros)
            self.text_dense2 = nn.Dense(self.emb_dim, kernel_init=init,
                                        bias_init=nn.initializers.zeros)

        if c.get("use_features"):
            feats = c.get("_item2features")
            shape = c.get("features_shape", [])
            if isinstance(shape, str):
                import ast
                shape = ast.literal_eval(shape)
            self.item2features = self.variable(
                "constants", "item2features",
                lambda: jnp.asarray(feats, jnp.int32) if feats is not None
                else jnp.zeros((self.n_items, max(len(shape), 1)), jnp.int32))
            self.features_embedding = nn.Embed(int(sum(shape)) or 1, self.emb_dim,
                                               embedding_init=padded_emb_init,
                                               dtype=self.compute_dtype,
                                               name="features_embedding")

        if int(c.get("time_seq", 0)):
            self.time_embedding = nn.Embed(int(c["time_seq"]), self.emb_dim,
                                           embedding_init=padded_emb_init,
                                           dtype=self.compute_dtype,
                                           name="time_embedding")

        if c.get("distance_type", "dot") == DistanceType.MLP.value:
            self.mlp_scorer = modules.MLPScorer(self.emb_dim, self.emb_dim,
                                                float(c.get("dropout_prob", 0.0)),
                                                act_f="tanh",
                                                kernel_init=init)
        self._define_model_layers()

    def _define_model_layers(self):
        pass

    # ------------------------------------------------------------- embeddings
    def _cast(self, x: jnp.ndarray) -> jnp.ndarray:
        """Cast an embedding/activation to the compute dtype (no-op at f32).

        The heavy lifting is done by ``dtype=`` on the nn.Embed tables
        (convert the [N, d] table, then gather — so the [B·L, d] forward
        write, the backward scatter's update read, and the scatter-add all
        run in bf16; casting AFTER the gather measured zero effect because
        XLA kept the f32 gather). This helper covers the remaining f32
        producers (text-MLP output, position tables in models that predate
        the dtype plumbing) so adds don't re-promote the sequence to f32."""
        return x if self.compute_dtype is None else x.astype(self.compute_dtype)

    def _masked_gather(self, emb: nn.Embed, ids: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.get("scan_embedding_grad"):
            # scatter-FREE backward (ops/embedding.py::gather_scan): sort +
            # MXU blocked-cumsum + boundary gathers. XLA's scatter combine
            # is row-serial (~15 ns/row); this path is data-parallel and
            # accumulates in f32.
            from unirec_tpu.ops.embedding import gather_scan
            return gather_scan(emb.embedding, ids,
                               self.compute_dtype) * (ids != 0)[..., None]
        if self.cfg.get("vmem_embedding_grad") \
                and not self.cfg.get("shard_embeddings"):
            # Pallas backward scatter with the whole table accumulated in
            # VMEM (ops/scatter_accum.py) — sidesteps the ~15 ns/row HBM
            # random-access toll when the table fits the VMEM budget.
            # Row-sharded tables keep the XLA scatter: a pallas_call under
            # GSPMD would need a shard_map wrapper to see only its shard.
            from unirec_tpu.ops import scatter_accum as SA
            table = self._cast(emb.embedding)
            if SA.scatter_vmem_supported(*table.shape, table.dtype):
                return SA.gather_vmem(table, ids) * (ids != 0)[..., None]
        if self.cfg.get("sorted_embedding_grad"):
            # sort-based backward scatter (ops/embedding.py) — the plain
            # gather's unsorted scatter-add grad is ~10x over its roofline
            # at bench shapes
            from unirec_tpu.ops.embedding import gather
            return self._cast(gather(emb.embedding, ids) * (ids != 0)[..., None])
        k = int(self.cfg.get("expand_embedding_grad", 0) or 0)
        if k > 1:
            # k-slot expanded backward scatter (ops/embedding.py) — spreads
            # duplicate-id collision chains over k independent slots. Cast
            # the TABLE first (like nn.Embed's dtype=) so the gather, the
            # expanded scatter, and its reduce all run in the compute dtype
            # — casting after the gather measured as a no-op (see _cast).
            from unirec_tpu.ops.embedding import gather_expand
            table = self._cast(emb.embedding)
            return gather_expand(table, ids, k) * (ids != 0)[..., None]
        if self.cfg.get("embedding_grad_f32") and self.compute_dtype is not None:
            # same forward as nn.Embed(dtype=bf16); backward scatter-adds
            # f32 rows instead of bf16 (ops/embedding.py::gather_cast)
            from unirec_tpu.ops.embedding import gather_cast
            return gather_cast(emb.embedding, ids,
                               self.compute_dtype) * (ids != 0)[..., None]
        return self._cast(emb(ids) * (ids != 0)[..., None])

    def _text_emb(self, items: jnp.ndarray) -> jnp.ndarray:
        table = self.text_embedding.value
        t = jax.lax.stop_gradient(table[items]) * (items != 0)[..., None]
        return self._cast(
            self.text_dense2(jax.nn.gelu(self.text_dense1(t), approximate=False)))

    def _features_emb(self, feats: jnp.ndarray) -> jnp.ndarray:
        return self._cast(self.features_embedding(feats)).sum(-2)

    def forward_item_emb(self, items, item_features=None):
        e = self._masked_gather(self.item_embedding, items)
        if self.cfg.get("use_features") and item_features is not None:
            e = e + self._features_emb(item_features)
        if self.cfg.get("use_text_emb"):
            e = e + self._text_emb(items)
        return e

    def item_embedding_for_user(self, item_seq, item_seq_features=None, time_seq=None):
        """Sequence-side item encoding (recommender.py:136-147)."""
        e = self._masked_gather(self.item_embedding, item_seq)
        if self.cfg.get("use_features") and item_seq_features is not None:
            e = e + self._features_emb(item_seq_features)
        if int(self.cfg.get("time_seq", 0)) and time_seq is not None:
            e = e + self._masked_gather(self.time_embedding, time_seq)
        if self.cfg.get("use_text_emb"):
            e = e + self._text_emb(item_seq)
        return e

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None, train: bool = False):
        return self._masked_gather(self.user_embedding, user_id)

    # ---------------------------------------------------------------- scoring
    def _predict_layer(self, user_emb, items_emb, user_id=None, item_id=None,
                       train: bool = False):
        dist = self.cfg.get("distance_type", "dot")
        if dist == DistanceType.DOT.value:
            scores = modules.inner_product_scores(user_emb, items_emb)
        elif dist == DistanceType.COSINE.value:
            scores = modules.cosine_scores(user_emb, items_emb)
        else:
            scores = self.mlp_scorer(user_emb, items_emb, train=train)

        if self.cfg.get("has_user_bias") and user_id is not None:
            ub = self.user_bias[user_id]
            if scores.ndim > ub.ndim:
                ub = ub[..., None]
            scores = scores + ub
        if self.cfg.get("has_item_bias") and item_id is not None:
            scores = scores + self.item_bias[item_id]
        scores = scores / float(self.cfg.get("tau", 1.0))
        clip = float(self.cfg.get("score_clip_value", -1) or -1)
        if clip > 0:
            scores = jnp.clip(scores, -clip, clip)
        return scores

    def _user_emb_from_batch(self, batch: Dict[str, jnp.ndarray], train: bool):
        return self.forward_user_emb(
            user_id=batch.get("user_id"), item_seq=batch.get("item_seq"),
            item_seq_len=batch.get("item_seq_len"),
            item_seq_features=batch.get("item_seq_features"),
            time_seq=batch.get("time_seq"), train=train)

    # ------------------------------------------------------------ entrypoints
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        """Training objective → (scalar_loss, per_row_loss)."""
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(batch["item_id"].shape[0], jnp.float32)

        if self.loss_type == LossType.FULLSOFTMAX.value:
            pos = batch["item_id"]
            if pos.ndim == 2:
                pos = pos[:, 0]
            all_ids = jnp.arange(self.n_items, dtype=jnp.int32)
            feats = self.item2features.value if self.cfg.get("use_features") else None
            items_emb = self.forward_item_emb(all_ids, feats)
            user_emb = self._user_emb_from_batch(batch, train)
            scores = self._predict_layer(user_emb, items_emb,
                                         batch.get("user_id"), all_ids, train=train)
            return L.full_softmax_loss(scores, pos, weight)

        items_emb = self.forward_item_emb(batch["item_id"], batch.get("item_features"))
        user_emb = self._user_emb_from_batch(batch, train)
        scores = self._predict_layer(user_emb, items_emb, batch.get("user_id"),
                                     batch["item_id"], train=train)
        label = batch.get("label")
        group = int(self.cfg.get("group_size", -1) or -1)
        if group > 0 and scores.ndim == 1:
            scores = scores.reshape(-1, group)
            label = label.reshape(-1, group) if label is not None else None
        return L.compute_loss(self.loss_type, scores, label, weight, self.cfg)

    def predict(self, batch: Dict[str, jnp.ndarray]):
        """Scores for the given (user, item(s)) rows (recommender.py:99-106)."""
        items_emb = self.forward_item_emb(batch["item_id"], batch.get("item_features"))
        user_emb = self._user_emb_from_batch(batch, train=False)
        return self._predict_layer(user_emb, items_emb, batch.get("user_id"),
                                   batch["item_id"], train=False)

    def user_emb(self, batch: Dict[str, jnp.ndarray]):
        return self._user_emb_from_batch(batch, train=False)

    def item_emb(self, items, item_features=None):
        return self.forward_item_emb(items, item_features)

    def all_item_emb(self):
        """Full-catalog item encodings [n_items, D] (recommender.py:108-128)."""
        ids = jnp.arange(self.n_items, dtype=jnp.int32)
        feats = self.item2features.value if self.cfg.get("use_features") else None
        return self.forward_item_emb(ids, feats)

    def bias_terms(self):
        """(user_bias or None, item_bias or None) for full-catalog eval."""
        ub = self.user_bias if self.cfg.get("has_user_bias") else None
        ib = self.item_bias if self.cfg.get("has_item_bias") else None
        return ub, ib


class SeqRecBase(BaseRecommender):
    is_seqrec: bool = True
