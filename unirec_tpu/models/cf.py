"""Collaborative-filtering retrieval models trained by SGD: MF, MultiVAE.

Closed-form solver models (EASE/SLIM/AdmmSLIM/SAR/UserCF) live in
models/solvers.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirec_tpu.models.base import BaseRecommender, SeqRecBase
from unirec_tpu.utils.registry import register_model


@register_model("MF")
class MF(BaseRecommender):
    """Matrix factorization: pure user-emb · item-emb (mf.py:6-11)."""


@register_model("MultiVAE")
class MultiVAE(BaseRecommender):
    """Variational autoencoder for implicit CF (multivae.py:9-120).

    Encoder input = history-sum embedding scaled by 1/sqrt(nnz); loss =
    masked full softmax over the catalog + annealed KL. The KL anneal factor
    is driven by the *step* (passed in the batch as ``anneal`` — the trainer
    feeds min(anneal_cap, global_step/total_anneal_steps), matching the
    reference recurrence at multivae.py:25,106-109), replacing the
    reference's mutable ``self.anneal`` counter. When no schedule is
    configured the factor falls back to the constant ``anneal_cap``.
    """

    is_seqrec: bool = True  # consumes item_seq (user history)

    def _define_model_layers(self):
        c = self.cfg
        init = self._init_fn()
        enc_dims = list(c.get("encoder_dims", [200]))
        dec_dims = list(c.get("decoder_dims", [200]))
        self.latent_dim = enc_dims[-1]
        enc_sizes = enc_dims[:-1] + [enc_dims[-1] * 2]
        self.encoder_layers = [
            nn.Dense(d, kernel_init=init, bias_init=nn.initializers.zeros,
                     name=f"encoder_{i}") for i, d in enumerate(enc_sizes)]
        dec_sizes = dec_dims + [self.emb_dim]
        self.decoder_layers = [
            nn.Dense(d, kernel_init=init, bias_init=nn.initializers.zeros,
                     name=f"decoder_{i}") for i, d in enumerate(dec_sizes)]
        self.vae_dropout = nn.Dropout(float(c.get("dropout_prob", 0.0)))

    def _encode(self, item_seq, item_seq_features, time_seq, train: bool):
        e = self.item_embedding_for_user(item_seq, item_seq_features, time_seq)
        nnz = (item_seq != 0).sum(-1, keepdims=True).astype(jnp.float32)
        h = e.sum(1) / (jnp.sqrt(nnz) + jnp.finfo(jnp.float32).eps)
        h = jnp.tanh(self.vae_dropout(h, deterministic=not train))
        for i, layer in enumerate(self.encoder_layers):
            h = layer(h)
            if i != len(self.encoder_layers) - 1:
                h = jnp.tanh(h)
        mu, logvar = jnp.split(h, 2, axis=-1)
        return mu, logvar

    def _decode(self, z):
        h = z
        for i, layer in enumerate(self.decoder_layers):
            h = layer(h)
            if i != len(self.decoder_layers) - 1:
                h = jnp.tanh(h)
        return h

    def _user_emb_from_batch(self, batch, train: bool):
        # threads the evaluator's per-call seed into the eval-time
        # reparameterization (see forward_user_emb)
        return self.forward_user_emb(
            user_id=batch.get("user_id"), item_seq=batch.get("item_seq"),
            item_seq_len=batch.get("item_seq_len"),
            item_seq_features=batch.get("item_seq_features"),
            time_seq=batch.get("time_seq"), train=train,
            reparam_seed=batch.get("reparam_seed"))

    def forward_user_emb(self, user_id=None, item_seq=None, item_seq_len=None,
                         item_seq_features=None, time_seq=None,
                         train: bool = False, reparam_seed=None):
        mu, logvar = self._encode(item_seq, item_seq_features, time_seq, train)
        if train:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            st = int(self.cfg.get("eval_reparameter_sampling_times", 0) or 0)
            if st > 0:
                # Reference parity (multivae.py:70-77): every eval forward
                # draws FRESH torch.randn noise — it advances the global
                # torch RNG, so successive validations of near-identical
                # params get different metrics. That jitter is load-bearing:
                # the plateau LR scheduler (patience=1) feeds on it; with a
                # fixed key every flat validation is bit-identical and the
                # scheduler collapses the LR to ~1e-17 before the model can
                # learn (r5 root-cause of the frozen MultiVAE rehearsal).
                # The evaluator threads a per-(evaluation, batch) seed
                # through the batch; a fixed key remains the no-seed
                # fallback for direct forward_user_emb callers.
                base = jax.random.PRNGKey(int(self.cfg.get("seed", 2022)))
                if reparam_seed is not None:
                    base = jax.random.fold_in(base, reparam_seed)
                eps = jax.random.normal(base, (*mu.shape, st)).mean(-1)
                z = mu + eps * jnp.exp(0.5 * logvar)
            else:
                z = mu
        return self._decode(z)

    def __call__(self, batch, train: bool = True):
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(batch["item_seq"].shape[0], jnp.float32)
        item_seq = batch["item_seq"]
        mu, logvar = self._encode(item_seq, batch.get("item_seq_features"),
                                  batch.get("time_seq"), train)
        eps = jax.random.normal(self.make_rng("dropout"), mu.shape) if train else 0.0
        z = mu + eps * jnp.exp(0.5 * logvar) if train else mu
        user_emb = self._decode(z)

        all_ids = jnp.arange(self.n_items, dtype=jnp.int32)
        feats = self.item2features.value if self.cfg.get("use_features") else None
        items_emb = self.forward_item_emb(all_ids, feats)
        all_scores = user_emb @ items_emb.T                      # [B, N]

        # masked multinomial softmax over history positions (multivae.py:115-120)
        pos_scores = jnp.take_along_axis(all_scores, item_seq, axis=-1)
        lse = jax.nn.logsumexp(all_scores, axis=-1, keepdims=True)
        nll = (lse - pos_scores) * (item_seq != 0) * weight[:, None]
        nnz = jnp.maximum(((item_seq != 0) * weight[:, None]).sum(), 1.0)
        softmax_loss = nll.sum() / nnz

        per_row_kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
        kl = jnp.sum(per_row_kl * weight) / jnp.maximum(weight.sum(), 1.0)
        anneal = batch.get("anneal", jnp.asarray(float(self.cfg.get("anneal_cap", 0.2))))
        loss = softmax_loss + anneal * kl
        per_row = (nll.sum(-1) / jnp.maximum((item_seq != 0).sum(-1), 1))
        return loss, per_row

    def predict(self, batch):
        user_emb = self._user_emb_from_batch(batch, train=False)
        items_emb = self.forward_item_emb(batch["item_id"], batch.get("item_features"))
        if items_emb.ndim == user_emb.ndim:
            if items_emb.shape == user_emb.shape:
                return (user_emb * items_emb).sum(-1)
            return user_emb @ items_emb.T
        return jnp.einsum("bd,bgd->bg", user_emb, items_emb)
