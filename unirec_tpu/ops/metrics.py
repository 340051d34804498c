"""On-device ranking metrics.

The reference computes ranks with a numba kernel over CPU numpy score
matrices (onepos.py:20-31): rank(row) = #{j>0 : row[j] > row[0]} after adding
tiny tie-breaking noise. Here the whole pipeline — scoring, history masking,
rank/top-k, metric values — runs inside one jit program; only per-row metric
scalars come back to the host.

Metric formulas (onepos.py:95-175):
    hit@k   = 1[rank < k]
    ndcg@k  = 1[rank < k] / log2(rank + 2)
    mrr@k   = 1[rank < k] / (rank + 1)
    group_auc = (n - 1 - rank) / (n - 1)
MultiPositive variants (multipos.py:45-210) are intersection-based over
top-K ids.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.constants import NINF_SCORE

TIE_NOISE = 1e-8


def parse_metrics(metrics_str_or_list) -> List[str]:
    """'[hit@5;10, ndcg@5;10]'-style spec → flat metric names."""
    if isinstance(metrics_str_or_list, str):
        import ast
        metrics = ast.literal_eval(metrics_str_or_list)
    else:
        metrics = list(metrics_str_or_list)
    flat = []
    for m in metrics:
        if "@" in m:
            name, ks = m.split("@")
            for k in ks.split(";"):
                flat.append(f"{name}@{int(k)}")
        else:
            flat.append(m)
    return flat


def add_tie_noise(scores: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    return scores + jax.random.uniform(
        key, scores.shape, minval=-TIE_NOISE, maxval=TIE_NOISE, dtype=scores.dtype)


# ----------------------------------------------------------- one positive
def onepos_rank_from_group(scores: jnp.ndarray) -> jnp.ndarray:
    """Rank of column 0 within each group row: #{j>0 : s_j > s_0}."""
    pos = scores[:, :1]
    return jnp.sum(scores[:, 1:] > pos, axis=-1).astype(jnp.int32)


def onepos_rank_full_catalog(scores: jnp.ndarray, pos_items: jnp.ndarray,
                             hist_items: jnp.ndarray, hist_len: jnp.ndarray,
                             key: jax.Array, topk: int = 0):
    """Rank of the positive item against the full catalog.

    Reproduces evaluator_abc.py:249-265 + onepos get_rank: the target score
    is captured before masking, user-history items are masked to NINF, item
    column 0 (padding item) never competes, and the positive column competes
    via its captured score only.

    Args:
        scores: [B, n_items] raw scores.
        pos_items: [B] positive item id per row.
        hist_items / hist_len: packed user history rows for masking.
    """
    B, N = scores.shape
    scores = add_tie_noise(scores, key)
    rows = jnp.arange(B)
    pos_score = scores[rows, pos_items]

    # mask history: scatter NINF at history positions (padded slots hit col 0,
    # which is excluded anyway)
    cap = hist_items.shape[1]
    valid_h = jnp.arange(cap)[None, :] < hist_len[:, None]
    hcols = jnp.where(valid_h, hist_items, 0)
    masked = scores.at[rows[:, None], hcols].set(NINF_SCORE)

    # exclude padding col 0 and the positive column itself
    masked = masked.at[:, 0].set(NINF_SCORE)
    competitors = masked.at[rows, pos_items].set(NINF_SCORE)
    rank = jnp.sum(competitors > pos_score[:, None], axis=-1).astype(jnp.int32)
    if topk <= 0:
        return rank, None
    # top-k recommendation list: positive competes with its real score
    # (evaluator_abc.py:124-128 positive-slot trick + get_topk_index)
    with_pos = masked.at[rows, pos_items].set(pos_score)
    from unirec_tpu.ops.topk import fast_topk
    topk_ids = fast_topk(with_pos, topk)[1]
    return rank, topk_ids


def onepos_metrics(rank: jnp.ndarray, n_scores: int,
                   metric_names: Sequence[str]) -> Dict[str, jnp.ndarray]:
    """Per-row metric values from ranks. n_scores = #columns in the score
    matrix (n_items for one-vs-all; group size for one-vs-k)."""
    r = rank.astype(jnp.float32)
    out = {}
    for m in metric_names:
        if m == "group_auc":
            out[m] = (n_scores - 1 - r) / max(n_scores - 1, 1)
        elif m == "ndcg":
            out[m] = 1.0 / jnp.log2(r + 2.0)
        elif m == "mrr":
            out[m] = 1.0 / (r + 1.0)
        elif "@" in m:
            name, k = m.split("@")
            k = int(k)
            hit = (rank < k).astype(jnp.float32)
            if name in ("hit", "recall"):
                out[m] = hit
            elif name == "ndcg":
                out[m] = hit / jnp.log2(r + 2.0)
            elif name == "mrr":
                out[m] = hit / (r + 1.0)
    return out


# --------------------------------------------------------- multi positive
def multipos_topk_and_metrics(scores: jnp.ndarray, pos_items: jnp.ndarray,
                              hist_items: jnp.ndarray, hist_len: jnp.ndarray,
                              metric_names: Sequence[str], max_k: int,
                              key: jax.Array) -> Dict[str, jnp.ndarray]:
    """One-vs-all metrics with multiple positives per user (T5/T6 eval).

    Follows evaluator_abc.py:260-265 (positives keep their scores, col 0 is
    NINF, history minus positives is NINF) + multipos.py intersection
    formulas. pos_items: [B, P] padded with 0.
    """
    B, N = scores.shape
    scores = add_tie_noise(scores, key)
    rows = jnp.arange(B)

    cap = hist_items.shape[1]
    valid_h = jnp.arange(cap)[None, :] < hist_len[:, None]
    hcols = jnp.where(valid_h, hist_items, 0)
    pos_scores = jnp.take_along_axis(scores, pos_items, axis=1)  # before masking
    masked = scores.at[rows[:, None], hcols].set(NINF_SCORE)
    # restore positives, kill col 0
    masked = jnp.where(
        jnp.zeros_like(masked, dtype=bool).at[rows[:, None], pos_items].set(pos_items > 0),
        scores, masked)
    masked = masked.at[:, 0].set(NINF_SCORE)

    from unirec_tpu.ops.topk import fast_topk
    _, top_ids = fast_topk(masked, max_k)                   # [B, K]
    hits = (top_ids[:, :, None] == pos_items[:, None, :]) & (pos_items[:, None, :] > 0)
    hit_at = hits.any(-1).astype(jnp.float32)               # [B, K]
    n_pos = (pos_items > 0).sum(-1).astype(jnp.float32)     # [B]

    w_ndcg = 1.0 / jnp.log2(jnp.arange(2, max_k + 2, dtype=jnp.float32))
    w_mrr = 1.0 / jnp.arange(1, max_k + 1, dtype=jnp.float32)
    ideal_cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(w_ndcg)])

    out = {}
    for m in metric_names:
        if m == "group_auc":
            # Per-row AUC over the full masked score matrix with all
            # positives as label 1 (multipos.py:184-191). Mann-Whitney from
            # ranks: with tie-noise applied, ties only occur among the
            # NINF-masked negatives, which never border a positive, so
            # plain ordinal ranks equal sklearn's tie-averaged ranks here.
            order = jnp.argsort(masked, axis=-1)          # ascending
            ranks = jnp.zeros((B, N), jnp.float32).at[
                rows[:, None], order].set(jnp.arange(1, N + 1, dtype=jnp.float32))
            pos_ranks = jnp.take_along_axis(ranks, pos_items, axis=1)
            p = n_pos
            sum_r = jnp.where(pos_items > 0, pos_ranks, 0.0).sum(-1)
            n_neg_ = N - p
            out[m] = (sum_r - p * (p + 1) / 2.0) / jnp.maximum(p * n_neg_, 1.0)
            continue
        if "@" not in m:
            continue
        name, k = m.split("@")
        k = int(k)
        topk_hits = hit_at[:, :k]
        if name == "hit":
            out[m] = (topk_hits.sum(-1) > 0).astype(jnp.float32)
        elif name == "recall":
            out[m] = topk_hits.sum(-1) / jnp.maximum(n_pos, 1.0)
        elif name == "ndcg":
            dcg = (topk_hits * w_ndcg[:k]).sum(-1)
            ideal = ideal_cum[jnp.minimum(n_pos.astype(jnp.int32), k)]
            out[m] = dcg / jnp.maximum(ideal, 1e-12)
        elif name == "mrr":
            out[m] = (topk_hits * w_mrr[:k]).sum(-1) / jnp.maximum(
                jnp.minimum(n_pos, float(k)), 1.0)
    return out


# ------------------------------------------------------------- host-side
def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC identical to sklearn.roc_auc_score for binary labels."""
    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    if len(scores) == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    # tie-averaged ranks, vectorized: segment-mean of 1-based positions
    # within each run of equal sorted scores
    s = scores[order]
    n = len(s)
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    np.not_equal(s[1:], s[:-1], out=new_group[1:])
    gid = np.cumsum(new_group) - 1
    pos_1based = np.arange(1, n + 1, dtype=np.float64)
    avg = np.bincount(gid, weights=pos_1based) / np.bincount(gid)
    ranks = np.empty(n, dtype=np.float64)
    ranks[order] = avg[gid]
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[labels > 0].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
