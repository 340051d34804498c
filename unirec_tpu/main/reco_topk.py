"""Batch top-k recommendation CLI.

TPU-native counterpart of the reference unirec/main/reco_topk.py:22-187. The
reference computes ``user_emb @ item_emb.T`` in CPU numpy and ranks with an
argpartition helper (reco_topk.py:56,87); here one jitted program per batch
does the full-catalog matmul on the MXU, masks user histories to -inf
(keeping the ``last_item`` target competitive), and takes a chunked exact top-k
on device — only the [B, topk] id matrix returns to host.

Two modes, matching the reference:
  - default: write ``topk`` item ids per user as csv rows (reco_topk.py:141-143)
  - ``item_file``: write per-(user, item) scores with a binary label marking
    the held-out target (reco_topk.py:42-76)
"""
from __future__ import annotations

import os
import sys
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from unirec_tpu import config as config_mod
from unirec_tpu.data.history import UserHistory
from unirec_tpu.main.infer_embedding import iter_infer_batches
from unirec_tpu.utils import file_io
from unirec_tpu.utils.checkpoint import load_model_freely
from unirec_tpu.utils.logger import setup_logger


def get_topk_recommendations(config, model, params, constants,
                             user_ids: np.ndarray, history: UserHistory,
                             topk: int, mesh=None) -> np.ndarray:
    """[n_users, topk] recommended item ids.

    With a multi-shard 'model' mesh axis the item table is row-sharded and
    top-k candidates merge across shards (ops/topk.py) — the catalog never
    needs to fit one device."""
    def variables(p):
        v = {"params": p}
        if constants:
            v["constants"] = constants
        return v

    traceable = hasattr(model, "init")
    last_item = int(config.get("last_item", 0))
    tau = float(config.get("tau", 1.0))
    # recall-tolerant serving: --topk_recall_target 0.95 switches the dense
    # path to the TPU-native PartialReduce op (lax.approx_max_k) — measured
    # 3.8x over the exact fused kernel at 1M items (bench/bench_topk.py:
    # 189.9k vs 49.4k users/s), the counterpart of the reference's optional
    # faiss-style approximate serving. History masking still applies (the
    # scores are masked BEFORE selection, so excluded items can never
    # surface); only the top-k selection itself is approximate.
    recall_target = float(config.get("topk_recall_target", 0) or 0)
    approx = 0.0 < recall_target < 1.0
    if approx and last_item > 0:
        # held-out-target evaluation re-inserts the target's score and then
        # selects; an approximate selector could drop a target that IS in
        # the true top-k, silently biasing the evaluation downward.
        # topk_recall_target is a serving-only knob — force exact here.
        import logging
        logging.getLogger("unirec_tpu").warning(
            "topk_recall_target ignored under last_item>0 (evaluation mode "
            "requires exact selection so the re-inserted target cannot be "
            "dropped by approx_max_k)")
        approx = False

    def scores_fn(p, batch, item_emb):
        from unirec_tpu.ops.topk import full_catalog_scores
        return full_catalog_scores(model, variables(p), batch, item_emb, tau)

    def topk_fn(p, batch, item_emb, hist_items, hist_len, target):
        scores = scores_fn(p, batch, item_emb)
        B = scores.shape[0]
        rows = jnp.arange(B)
        target_score = scores[rows, target]
        cap = hist_items.shape[1]
        valid_h = jnp.arange(cap)[None, :] < hist_len[:, None]
        hcols = jnp.where(valid_h, hist_items, 0)
        masked = scores.at[rows[:, None], hcols].set(-jnp.inf)
        masked = masked.at[:, 0].set(-jnp.inf)
        if last_item > 0:  # held-out target stays competitive (reco_topk.py:81-85)
            masked = masked.at[rows, target].set(target_score)
        from unirec_tpu.ops.topk import fast_topk
        return fast_topk(masked, topk, exact=not approx,
                         recall_target=recall_target or 0.95)[1]

    if traceable:
        topk_fn = jax.jit(topk_fn)
        scores_fn_j = jax.jit(scores_fn)
    else:
        scores_fn_j = scores_fn

    item_emb = model.apply(variables(params), method="all_item_emb")

    # fused single-chip serving path: the Pallas blockmax kernel + two-pass
    # exact top-k never materializes the [B, n_items] score matrix
    # (ops/topk.py fused_catalog_topk; measured 1.16x over matmul+fast_topk
    # and 13x over matmul+lax.top_k at 1M items, bench/bench_topk.py).
    # Per-user bias and tau shift/scale whole rows and cannot
    # change the ranking; the item bias folds into an extra factor column.
    fused_flag = config.get("use_fused_topk")
    if fused_flag is None:  # default: on for TPU serving-scale catalogs
        fused_flag = (jax.default_backend() == "tpu"
                      and item_emb.shape[0] >= 16384)
    fused = (traceable and last_item <= 0 and bool(int(fused_flag))
             and not approx
             and (mesh is None or getattr(mesh, "n_model", 1) <= 1))
    if fused:
        from unirec_tpu.ops.topk import fused_catalog_topk, quantize_catalog
        _, item_bias = model.apply(variables(params), method="bias_terms")
        if item_bias is not None:
            item_aug = jnp.concatenate(
                [jnp.asarray(item_emb),
                 jnp.asarray(item_bias)[:, None].astype(item_emb.dtype)], 1)
        else:
            item_aug = jnp.asarray(item_emb)
        # --catalog_int8 1: per-row symmetric int8 catalog — halves the
        # serving read vs bf16 and doubles the items-per-chip capacity;
        # scores (incl. the folded bias column) are approximate with
        # measured ranking recall (bench/probe_int8_recall.py).
        item_scale = None
        if int(config.get("catalog_int8", 0) or 0):
            item_aug, item_scale = quantize_catalog(item_aug)

        def fused_topk_fn(p, batch, item_aug, hist_items, hist_len,
                          item_scale=None):
            user_emb = model.apply(variables(p), batch, method="user_emb")
            if item_bias is not None:
                user_emb = jnp.concatenate(
                    [user_emb,
                     jnp.ones((user_emb.shape[0], 1), user_emb.dtype)], 1)
            _, ids = fused_catalog_topk(user_emb, item_aug, topk,
                                        hist_items=hist_items,
                                        hist_len=hist_len,
                                        exclude_pad_item=True,
                                        item_scale=item_scale)
            return ids

        fused_topk_fn = jax.jit(fused_topk_fn)

    # row-sharded serving path: the catalog lives sharded over the 'model'
    # mesh axis; exact top-k merges k+C candidates per shard (ops/topk.py)
    sharded = (mesh is not None and getattr(mesh, "n_model", 1) > 1
               and traceable and last_item <= 0 and not approx)
    if sharded:
        from unirec_tpu.ops.topk import (masked_sharded_topk,
                                         place_item_table, quantize_catalog)
        from jax.sharding import NamedSharding, PartitionSpec
        n_items_real = int(item_emb.shape[0])
        item_full = jnp.asarray(item_emb)
        scale_sharded = None
        if int(config.get("catalog_int8", 0) or 0):
            # per-shard int8: half the catalog footprint per chip
            item_full, scale = quantize_catalog(item_full)
            item_table, n_pad = place_item_table(item_full, mesh.mesh)
            scale_padded = jnp.concatenate(
                [scale, jnp.zeros(n_pad - n_items_real, scale.dtype)])
            scale_sharded = jax.device_put(
                scale_padded, NamedSharding(mesh.mesh,
                                            PartitionSpec("model")))
        else:
            item_table, n_pad = place_item_table(item_full, mesh.mesh)
        _, ib = model.apply(variables(params), method="bias_terms")
        bias = None
        if ib is not None:
            bias = jnp.concatenate(
                [jnp.asarray(ib), jnp.zeros(n_pad - n_items_real)])

        def sharded_topk_fn(p, batch, hist_items, hist_len):
            # the per-user bias and tau shift/scale every column equally, so
            # they cannot change the ranking; only the item bias matters
            user_emb = model.apply(variables(p), batch, method="user_emb")
            _, ids = masked_sharded_topk(user_emb, item_table,
                                         hist_items, hist_len, topk,
                                         mesh.mesh, item_bias=bias,
                                         n_real=n_items_real,
                                         item_scale=scale_sharded)
            return ids

        sharded_topk_fn = jax.jit(sharded_topk_fn)

    item_file = config.get("item_file") or ""
    out_rows = []
    score_lines = []
    user2items = {}
    if item_file:
        with open(item_file) as f:
            for line in f:
                u, items = line.strip().split("\t")
                user2items[int(u)] = [int(t) for t in items.split(",")]

    # dispatch-only sweep (docs/performance_notes.md): every batch's program
    # is queued without a host round-trip; one jax.device_get at the end
    # drains the whole stream.
    is_seqrec = bool(getattr(model, "is_seqrec", False))
    pending, reals, metas = [], [], []
    for batch in iter_infer_batches(config, user_ids, history, is_seqrec):
        n_real = batch.pop("n_real")
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        uids = batch["user_id"][:n_real]
        hist_items, hist_len = history.gather(batch["user_id"])
        if last_item > 0:
            target = hist_items[np.arange(len(hist_len)),
                                np.maximum(hist_len - last_item, 0)]
        else:
            target = np.zeros(len(hist_len), np.int32)
        reals.append(n_real)
        metas.append((uids, target))
        if item_file:
            pending.append(scores_fn_j(params, jb, item_emb))
        elif sharded:
            pending.append(sharded_topk_fn(params, jb,
                                           jnp.asarray(hist_items),
                                           jnp.asarray(hist_len)))
        elif fused:
            pending.append(fused_topk_fn(params, jb, item_aug,
                                         jnp.asarray(hist_items),
                                         jnp.asarray(hist_len),
                                         item_scale=item_scale))
        else:
            pending.append(topk_fn(params, jb, item_emb,
                                   jnp.asarray(hist_items),
                                   jnp.asarray(hist_len),
                                   jnp.asarray(target)))
    fetched = [np.asarray(x)[:n] for x, n in
               zip(jax.device_get(pending), reals)]

    if item_file:
        for scores, (uids, target) in zip(fetched, metas):
            for i, u in enumerate(uids):
                for it in user2items.get(int(u), []):
                    label = "1" if it == int(target[i]) else "0"
                    s = scores[i][it] if it > 0 else 0.0
                    score_lines.append(f"{int(u)}\t{it}\t{s}\t{label}\n")
        return score_lines
    return np.concatenate(fetched, axis=0)


def do_topk_reco(config: Dict) -> np.ndarray:
    out_path = config.get("output_path", "topk_reco.csv")
    logger = setup_logger(config.get("exp_name", "reco_topk"),
                          os.path.dirname(os.path.abspath(out_path)))
    model, params, constants, ckpt_cfg = load_model_freely(config["model_file"])
    merged = dict(ckpt_cfg)
    merged.update(config)
    config = merged

    dpath = config["dataset_path"]
    user_ids = np.loadtxt(os.path.join(dpath, config["dataset_name"]),
                          dtype=np.int64).reshape(-1)
    logger.info("#. users for recommendations: %d", len(user_ids))

    fname = config.get("user_history_filename", "user_history")
    fmt = config.get("user_history_file_format", config.get("train_file_format"))
    history = UserHistory.load(os.path.join(dpath, fname),
                               int(config["n_users"]), fmt)

    from unirec_tpu.core.mesh import create_mesh
    mesh = create_mesh(config)
    res = get_topk_recommendations(config, model, params, constants, user_ids,
                                   history, int(config.get("topk", 100)),
                                   mesh=mesh)
    if config.get("item_file"):
        with open(out_path, "w") as f:
            f.writelines(res)
        logger.info("saved per-item scores to %s", out_path)
    else:
        np.savetxt(out_path, res, delimiter=",", fmt="%i")
        logger.info("saved top-%s recommendations to %s",
                    config.get("topk", 100), out_path)
    return res


if __name__ == "__main__":
    do_topk_reco(config_mod.parse_cmd_arguments(sys.argv[1:]))
