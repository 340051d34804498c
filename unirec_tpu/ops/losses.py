"""Ranking losses as pure functions over grouped score matrices.

Numerical semantics match the reference's ``_cal_loss``
(reco_abc.py:220-272) and modules.bpr_loss/ccl_loss (modules.py:15-35),
with row weights added so padded batch rows contribute nothing.

Every function returns (scalar_loss, per_row_loss[B]); the per-row vector
feeds MoRec's per-objective control (trainer.py:331-338) without a second
pass.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

from unirec_tpu.constants import EPS, LossType


def _weighted_mean(per_row: jnp.ndarray, weight: jnp.ndarray):
    w = weight.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_loss(scores, labels, weight):
    """BCE over sigmoid probabilities, probability clipped like the reference's
    torch.clamp(sigmoid, max=1-EPS) (reco_abc.py:249)."""
    p = jnp.clip(jnn.sigmoid(scores), EPS, 1.0 - EPS)
    l = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    per_row = l.mean(axis=-1) if l.ndim > 1 else l
    return _weighted_mean(per_row, weight), per_row


def bpr_loss(scores, labels, weight):
    """First column is the positive; the rest are negatives (reco_abc.py:252-255)."""
    pos = scores[:, :1]
    neg = scores[:, 1:]
    l = -jnp.log(EPS + jnn.sigmoid(pos - neg))
    per_row = l.mean(axis=-1)
    return _weighted_mean(per_row, weight), per_row


def ccl_loss(scores, labels, weight, ccl_w: float, ccl_m: float):
    """Cosine contrastive loss (SimpleX, CIKM'21) — modules.py:28-35."""
    pos = scores[:, 0]
    neg = scores[:, 1:]
    per_row = 1.0 - pos + ccl_w * jnp.mean(jnp.maximum(neg - ccl_m, 0.0), axis=-1)
    return _weighted_mean(per_row, weight), per_row


def sampled_softmax_loss(scores, labels, weight):
    """-log_softmax at positive positions; supports multiple positives per
    group (reco_abc.py:260-265)."""
    nll = -jnn.log_softmax(scores, axis=-1)
    pos_mask = (labels > 0).astype(scores.dtype)
    per_row = jnp.sum(nll * pos_mask, axis=-1) / jnp.maximum(pos_mask.sum(-1), 1.0)
    # the reference averages over all positive *elements*; weight rows by
    # their positive count to reproduce that exactly
    row_w = weight * pos_mask.sum(-1)
    loss = jnp.sum(nll * pos_mask * weight[:, None]) / jnp.maximum(jnp.sum(row_w), 1.0)
    return loss, per_row


def full_softmax_loss(all_scores, pos_items, weight):
    """logsumexp over the catalog minus the positive's score
    (reco_abc.py:266-270). all_scores: [B, n_items]; pos_items: [B] int."""
    all_scores = all_scores.astype(jnp.float32)
    pos_score = jnp.take_along_axis(all_scores, pos_items[:, None].astype(jnp.int32), axis=1)[:, 0]
    per_row = jnn.logsumexp(all_scores, axis=-1) - pos_score
    return _weighted_mean(per_row, weight), per_row


def compute_loss(loss_type: str, scores, labels, weight, config):
    # losses always run fp32, whatever the tower compute dtype was
    scores = scores.astype(jnp.float32)
    if labels is not None:
        labels = labels.astype(jnp.float32)
    if loss_type == LossType.BCE.value:
        return bce_loss(scores, labels, weight)
    if loss_type == LossType.BPR.value:
        return bpr_loss(scores, labels, weight)
    if loss_type == LossType.CCL.value:
        return ccl_loss(scores, labels, weight,
                        float(config.get("ccl_w", 150)), float(config.get("ccl_m", 0.4)))
    if loss_type == LossType.SOFTMAX.value:
        return sampled_softmax_loss(scores, labels, weight)
    raise ValueError(f"unknown loss type: {loss_type}")
