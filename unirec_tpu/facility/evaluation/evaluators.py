"""Evaluation drivers for the three protocols.

Equivalents of the reference evaluators (facility/evaluation/*.py) with the
scoring hot path moved on-device:

  - one_vs_all: the reference scores the full catalog in CPU numpy
    (evaluator_abc.py:218-247) and ranks with numba (onepos.py:20-31). Here a
    single jit program computes user embeddings, the [B, n_items] matmul,
    history masking, tie-break noise, ranks/top-k and per-row metric values;
    only small per-row metric vectors return to host.
  - one_vs_k / label_aware: grouped scores from ``model.predict``.
  - session_aware: scores on device, session grouping + per-session metrics
    on host (sessions are ragged; volume is tiny).

All metric formulas match onepos.py / multipos.py / sessionwise.py.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.constants import DataFormat, EvalProtocol
from unirec_tpu.data.history import UserHistory
from unirec_tpu.ops import metrics as M


def _np(x):
    return np.asarray(jax.device_get(x))


class _EvaluatorBase:
    def __init__(self, config: Dict[str, Any], model, mesh=None):
        self.config = config
        self.model = model
        self.mesh = mesh
        self.metric_names = M.parse_metrics(config.get("metrics", "['group_auc']"))
        self.seed = int(config.get("seed", 2022))
        # solver models (models/solvers.py) do host-side sparse work in
        # apply(); only pure metric math is jitted for them
        self.traceable = hasattr(model, "init")

    # --------------------------------------------------------------- helpers
    def _to_device(self, batch):
        """Device-put a host batch, sharding the leading axis over the mesh
        'data' axis when more than one device is present (replaces the
        reference's per-rank dataloader sharding, evaluator_abc.py:160-168).
        Rows may be padded with zero-weight copies; callers must read host
        columns via ``_host_batch`` so padding matches the device batch."""
        # per-(evaluation, batch) reparameterization seed: reference parity
        # for models whose EVAL forward samples noise (MultiVAE's
        # eval_reparameter_sampling_times — torch.randn there advances the
        # global RNG, so no two eval forwards see the same noise; see
        # models/cf.py::MultiVAE.forward_user_emb for why this jitter is
        # load-bearing). Deterministic given the run's evaluation history.
        self._eval_batch_counter = getattr(self, "_eval_batch_counter", 0) + 1
        batch = dict(batch,
                     reparam_seed=np.int32(self._eval_batch_counter))
        if self.mesh is not None and getattr(self.mesh, "n_devices", 1) > 1:
            return self.mesh.shard_batch(batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _host_batch(self, batch):
        """Host-side view of ``batch`` padded exactly like ``_to_device``
        pads it (zero-weight last-row copies to the data-axis multiple), so
        dispatch-only eval sweeps can read weight/id columns without a
        device round-trip."""
        d = (self.mesh.n_data
             if self.mesh is not None and getattr(self.mesh, "n_devices", 1) > 1
             else 1)
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if d > 1 and v.ndim >= 1 and v.shape[0] % d != 0:
                pad = d - (v.shape[0] % d)
                filler = np.repeat(v[-1:], pad, axis=0)
                if k == "weight":
                    filler = np.zeros_like(filler)
                v = np.concatenate([v, filler], axis=0)
            out[k] = v
        return out

    def _variables(self, params, constants):
        v = {"params": params}
        if constants:
            v["constants"] = constants
        return v

    def _jit(self, fn, **kw):
        """jit with REPLICATED outputs when the mesh spans processes: the
        dispatch-only sweeps fetch per-batch outputs with jax.device_get,
        which requires every shard to be addressable locally. Single-process
        meshes skip the constraint (and the all-gather it implies)."""
        if self.mesh is not None and jax.process_count() > 1:
            kw.setdefault("out_shardings", self.mesh.replicated())
        return jax.jit(fn, **kw)

    def _predict(self, params, constants, jb):
        if self.traceable:
            if not hasattr(self, "_pred_jit"):
                self._pred_jit = self._jit(lambda p, c, b: self.model.apply(
                    self._variables(p, c), b, method="predict"))
            return self._pred_jit(params, constants, jb)
        return self.model.apply(self._variables(params, constants), jb,
                                method="predict")

    def predict_scores(self, batcher, params, constants=None) -> np.ndarray:
        """Raw score inference for the infer task (evaluator_abc.py:175),
        available under every protocol."""
        pending, keeps = [], []
        for batch in batcher:
            jb = self._to_device(batch)
            pending.append(self._predict(params, constants, jb))
            keeps.append(self._host_batch(batch)["weight"] > 0)
        return np.concatenate([np.asarray(s)[k] for s, k in
                               zip(jax.device_get(pending), keeps)])

    def merge(self, rows: Dict[str, List[np.ndarray]],
              weights: List[np.ndarray]) -> Dict[str, float]:
        w = np.concatenate(weights)
        out = {}
        for k, vals in rows.items():
            v = np.concatenate(vals)
            out[k] = float(np.sum(v * w) / max(np.sum(w), 1.0))
        return out


class OnePositiveEvaluator(_EvaluatorBase):
    """One positive per row; both one-vs-k (grouped scores) and one-vs-all
    (full catalog) paths."""

    MOREC_PREFIXES = ("rhit", "rndcg", "rrecall", "pop-kl")

    def __init__(self, config, model, mesh=None):
        super().__init__(config, model, mesh)
        # MoRec item meta (price / fairness / alignment groups) — present when
        # main.py loaded item_meta_morec (reference evaluator_abc.py:107-118)
        self.item_meta = config.get("_item_meta_morec")
        self.align_dist = config.get("_alignment_dist")
        # bare (no-@k) r-metrics are session-wise only (sessionwise.py:
        # 171-173); the one-positive family has no @-less definition
        # (onepos.py:133-173) — drop them rather than crash when the same
        # metrics string drives both a session test and a one-vs-all valid
        _session_only = [m for m in self.metric_names if "@" not in m and
                         m in ("rhit", "rndcg", "rrecall")]
        self.morec_names = [m for m in self.metric_names
                            if (m.split("@")[0] in self.MOREC_PREFIXES
                                or m == "least-misery")
                            and m not in _session_only]
        self.base_names = [m for m in self.metric_names
                           if m not in self.morec_names and m != "auc"
                           and m not in _session_only]
        pop_ks = [int(m.split("@")[1]) for m in self.morec_names
                  if m.startswith("pop-kl@")]
        self._popkl_k = max(pop_ks) if pop_ks else 0

        def _group_metrics(scores, key):
            scores = M.add_tie_noise(scores, key)
            rank = M.onepos_rank_from_group(scores)
            return M.onepos_metrics(rank, scores.shape[1], tuple(self.base_names))

        def _user_scores(params, constants, item_emb, batch):
            from unirec_tpu.ops.topk import full_catalog_scores
            return full_catalog_scores(self.model,
                                       self._variables(params, constants),
                                       batch, item_emb,
                                       float(self.config.get("tau", 1.0)))

        def _ova_metrics(scores, pos, hist_items, hist_len, key, n_items,
                         topk):
            rank, topk_ids = M.onepos_rank_full_catalog(
                scores, pos, hist_items, hist_len, key, topk=topk)
            vals = M.onepos_metrics(rank, n_items, tuple(self.base_names))
            return vals, rank, topk_ids

        def _ova_full(params, constants, item_emb, batch, hist_items,
                      hist_len, key, n_items, topk):
            # scores + rank + metrics as ONE program: one dispatch per batch
            # instead of two, and XLA fuses the history masking / tie noise
            # into the consumers of the [B, n_items] matmul
            scores = _user_scores(params, constants, item_emb, batch)
            pos = batch["item_id"]
            if pos.ndim == 2:
                pos = pos[:, 0]
            return _ova_metrics(scores, pos, hist_items, hist_len, key,
                                n_items, topk)

        self._group_metrics = self._jit(_group_metrics)
        self._user_scores_fn = self._jit(_user_scores) if self.traceable \
            else _user_scores
        self._ova_metrics = self._jit(_ova_metrics,
                                      static_argnames=("n_items", "topk"))
        self._ova_full = (self._jit(_ova_full,
                                    static_argnames=("n_items", "topk"))
                          if self.traceable else None)

    def _item_table(self, params, constants):
        if self.traceable:
            return self._jit(lambda p, c: self.model.apply(
                self._variables(p, c), method="all_item_emb"))(params, constants)
        return self.model.apply(None, method="all_item_emb")

    def evaluate(self, batcher, params, constants=None) -> Dict[str, float]:
        # the MoRec metric family (rhit/rndcg/pop-kl/least-misery) needs the
        # full-catalog path; under grouped (one_vs_k) evaluation those names
        # are skipped — the reference's grouped path likewise cannot supply
        # the pos_itemids they require (onepos.py:108-110)
        group_names = list(self.base_names)
        rows: Dict[str, List[np.ndarray]] = {m: [] for m in group_names}
        weights = []
        # 'auc' is a single global ROC-AUC over every (score, label) pair
        # (onepos.py:136-137), computed host-side after the sweep
        want_auc = "auc" in self.metric_names
        auc_scores: List[np.ndarray] = []
        auc_labels: List[np.ndarray] = []
        key = jax.random.PRNGKey(self.seed + 101)
        # dispatch-only sweep; all device->host fetches happen once at the
        # end (see evaluate_full for the measured rationale)
        pending = []
        for i, batch in enumerate(batcher):
            jb = self._to_device(batch)
            hb = self._host_batch(batch)
            w_host = hb["weight"]
            scores = self._predict(params, constants, jb)
            if scores.ndim == 1:
                g = int(self.config.get("group_size", -1) or -1)
                if g > 0:
                    scores = scores.reshape(-1, g)
                else:
                    scores = scores.reshape(len(w_host), -1)
            vals = self._group_metrics(scores, jax.random.fold_in(key, i))
            need_auc = want_auc and "label" in batch
            pending.append((vals, scores if need_auc else None,
                            hb["label"] if need_auc else None))
            w = w_host
            if scores.shape[0] != len(w):  # per-group rows after reshape
                w = np.repeat(w, scores.shape[0] // len(w))
            weights.append((w_host, w))
        pending = jax.device_get(pending)
        for (w_host, _), (vals, sc, lab) in zip(weights, pending):
            if sc is not None:
                keep = w_host > 0
                auc_scores.append(np.asarray(sc).reshape(len(keep), -1)[keep])
                auc_labels.append(np.asarray(lab).reshape(len(keep), -1)[keep])
            for m in group_names:
                rows[m].append(np.asarray(vals[m]))
        weights = [w for _, w in weights]
        out = self.merge(rows, weights)
        if want_auc and auc_scores:
            out["auc"] = M.roc_auc(np.concatenate(auc_labels).reshape(-1),
                                   np.concatenate(auc_scores).reshape(-1))
        return out

    def evaluate_full(self, batcher, params, history: UserHistory,
                      constants=None) -> Dict[str, float]:
        item_emb = self._item_table(params, constants)
        n_items = int(self.config["n_items"])
        per_row_names = self.base_names + [m for m in self.morec_names
                                           if not m.startswith("pop-kl")
                                           and m != "least-misery"]
        rows: Dict[str, List[np.ndarray]] = {m: [] for m in per_row_names}
        group_ids: List[np.ndarray] = []   # fair group of each positive
        popkl_counts: Dict[str, np.ndarray] = {
            m: None for m in self.morec_names if m.startswith("pop-kl")}
        weights = []
        key = jax.random.PRNGKey(self.seed + 202)
        meta = self.item_meta
        # DISPATCH-ONLY sweep: no device->host transfer happens inside the
        # loop (each one is a full round-trip that stalls the pipeline —
        # measured 218 ms per 256-user batch through the serialized
        # per-metric fetches vs 0.63 ms of actual device time). Per-batch
        # outputs stay on device; everything is fetched once at the end.
        pending = []   # (vals dict, rank, topk_ids, pos) device arrays
        for i, batch in enumerate(batcher):
            jb = self._to_device(batch)
            hb = self._host_batch(batch)
            w_host = hb["weight"]
            hist_items, hist_len = history.gather(hb["user_id"])
            if self._ova_full is not None:
                vals, rank, topk_ids = self._ova_full(
                    params, constants, item_emb, jb,
                    jnp.asarray(hist_items), jnp.asarray(hist_len),
                    jax.random.fold_in(key, i), n_items=n_items,
                    topk=self._popkl_k)
            else:  # solver models: host-side scoring, jitted metrics only
                scores = self._user_scores_fn(params, constants, item_emb, jb)
                pos = jb["item_id"]
                if pos.ndim == 2:
                    pos = pos[:, 0]
                vals, rank, topk_ids = self._ova_metrics(
                    scores, pos, jnp.asarray(hist_items),
                    jnp.asarray(hist_len), jax.random.fold_in(key, i),
                    n_items=n_items, topk=self._popkl_k)
            weights.append(w_host)
            # queue the HOST copy of pos: the device one may be sharded
            # across processes (not locally fetchable)
            pos_host = hb["item_id"]
            if pos_host.ndim == 2:
                pos_host = pos_host[:, 0]
            pending.append((vals, rank, topk_ids, pos_host))

        # single bulk fetch of every queued batch's outputs
        pending = jax.device_get(pending)
        for w_host, (vals, rank_np, topk_np, pos_np) in zip(weights, pending):
            for m in self.base_names:
                rows[m].append(np.asarray(vals[m]))
            if not self.morec_names:
                continue
            # ---- MoRec metrics (onepos.py:133-173), host-side tiny math
            keep = w_host > 0
            prices = meta["weight"][pos_np] if meta is not None and \
                "weight" in meta else np.ones_like(pos_np, np.float64)
            for m in self.morec_names:
                name = m.split("@")[0]
                if name in ("rhit", "rrecall"):
                    k = int(m.split("@")[1])
                    rows[m].append((rank_np < k).astype(np.float64) * prices)
                elif name == "rndcg":
                    k = int(m.split("@")[1])
                    rows[m].append((rank_np < k) / np.log2(rank_np + 2.0) * prices)
                elif name == "pop-kl":
                    k = int(m.split("@")[1])
                    i2g = meta["align_group"]
                    ids = np.asarray(topk_np)[keep][:, :k].reshape(-1)
                    counts = np.bincount(i2g[ids], minlength=int(i2g.max()) + 1)
                    if popkl_counts[m] is None:
                        popkl_counts[m] = counts.astype(np.float64)
                    else:
                        popkl_counts[m] += counts
            if "least-misery" in self.morec_names and meta is not None:
                group_ids.append(meta["fair_group"][pos_np])
        out = self.merge(rows, weights)
        # pop-kl@k: KL(alignment_dist ‖ topk group freq) (onepos.py:53-68)
        for m, counts in popkl_counts.items():
            freq = counts[1:] / max(counts[1:].sum(), 1e-10)
            tgt = np.asarray(self.align_dist, np.float64)
            out[m] = float(np.sum(
                (tgt + 1e-10) * (np.log(tgt + 1e-10) - np.log(freq + 1e-10))))
        # least-misery: min over fair groups of each per-row metric's mean
        # (onepos.py:206-217)
        if group_ids:
            gid = np.concatenate(group_ids)
            w = np.concatenate(weights) > 0
            for m in per_row_names:
                v = np.concatenate(rows[m])
                vv, gg = v[w[: len(v)]], gid[w[: len(gid)]]
                mins = [vv[gg == g].mean() for g in np.unique(gg) if g > 0
                        and (gg == g).any()]
                if mins:
                    out[f"min-{m}"] = float(min(mins))
        return out

class MultiPositiveEvaluator(OnePositiveEvaluator):
    """One-vs-all with multiple positives per user (T5/T6 eval)."""

    @staticmethod
    def _supported(names):
        # @k metrics + per-row AUC ('group_auc', multipos.py:184-191)
        return tuple(m for m in names if "@" in m or m == "group_auc")

    def __init__(self, config, model, mesh=None):
        super().__init__(config, model, mesh)
        ks = [int(m.split("@")[1]) for m in self.metric_names if "@" in m]
        self.max_k = max(ks) if ks else 10

        def _mp_metrics(scores, pos_items, hist_items, hist_len, key):
            return M.multipos_topk_and_metrics(
                scores, pos_items, hist_items, hist_len,
                self._supported(self.metric_names), self.max_k, key)

        def _mp_full(params, constants, item_emb, batch, hist_items,
                     hist_len, key):
            # one dispatch per batch: scores + top-k + metrics fused
            # (calling the jitted scores fn here inlines it into this jit)
            scores = self._user_scores_fn(params, constants, item_emb, batch)
            return _mp_metrics(scores, batch["item_id"], hist_items,
                               hist_len, key)

        self._mp_metrics = self._jit(_mp_metrics)
        self._mp_full = self._jit(_mp_full) if self.traceable else None

    def evaluate_full(self, batcher, params, history: UserHistory,
                      constants=None) -> Dict[str, float]:
        item_emb = self._item_table(params, constants)
        names = list(self._supported(self.metric_names))
        rows: Dict[str, List[np.ndarray]] = {m: [] for m in names}
        weights = []
        key = jax.random.PRNGKey(self.seed + 303)
        pending = []   # dispatch-only sweep; one bulk fetch at the end
        for i, batch in enumerate(batcher):
            jb = self._to_device(batch)
            hb = self._host_batch(batch)
            hist_items, hist_len = history.gather(hb["user_id"])
            if self._mp_full is not None:
                vals = self._mp_full(params, constants, item_emb, jb,
                                     jnp.asarray(hist_items),
                                     jnp.asarray(hist_len),
                                     jax.random.fold_in(key, i))
            else:
                scores = self._user_scores_fn(params, constants, item_emb, jb)
                vals = self._mp_metrics(scores, jb["item_id"],
                                        jnp.asarray(hist_items),
                                        jnp.asarray(hist_len),
                                        jax.random.fold_in(key, i))
            pending.append(vals)
            weights.append(hb["weight"])
        for vals in jax.device_get(pending):
            for m in names:
                rows[m].append(np.asarray(vals[m]))
        return self.merge(rows, weights)


class SessionWiseEvaluator(_EvaluatorBase):
    """Session-grouped metrics (sessionwise.py): score on device, group and
    reduce per session on host. Sessions that are all-positive or all-negative
    are dropped (sessionwise.py:104-115).

    Price/GMV-weighted variants (rhit/rrecall/rndcg, sessionwise.py:39-83,
    from 'A Pareto-Efficient Algorithm for Multiple Objective Optimization
    in E-Commerce Recommendation'): per-row prices come from the MoRec item
    meta's weight column keyed by item_id (evaluator_abc.py:145-169)."""

    PRICE_PREFIXES = ("rndcg", "rhit", "rrecall")

    def __init__(self, config, model, mesh=None):
        super().__init__(config, model, mesh)
        self.item_meta = config.get("_item_meta_morec")
        self._need_prices = any(
            m.split("@")[0] in self.PRICE_PREFIXES for m in self.metric_names)

    def evaluate(self, batcher, params, constants=None) -> Dict[str, float]:
        scores, labels, sessions, item_ids = [], [], [], []
        pending = []   # dispatch-only sweep; one bulk fetch at the end
        for batch in batcher:
            jb = self._to_device(batch)
            hb = self._host_batch(batch)
            pending.append((hb["weight"],
                            self._predict(params, constants, jb)))
            labels.append(hb["label"].reshape(-1))
            sessions.append((hb["session_id"] if "session_id" in hb
                             else hb["user_id"]).reshape(-1))
            if self._need_prices:
                item_ids.append(hb["item_id"].reshape(-1))
        for i, (w_host, s_dev) in enumerate(jax.device_get(pending)):
            s = np.asarray(s_dev).reshape(-1)
            keep = np.repeat(w_host > 0, s.shape[0] // len(w_host))
            scores.append(s[keep])
            labels[i] = labels[i][keep]
            sessions[i] = sessions[i][keep]
            if self._need_prices:
                item_ids[i] = item_ids[i][keep]
        prices = None
        if self._need_prices:
            ids = np.concatenate(item_ids)
            prices = (self.item_meta["weight"][ids]
                      if self.item_meta is not None and
                      "weight" in self.item_meta
                      else np.ones(len(ids), np.float64))
        return self.evaluate_with_scores(np.concatenate(scores),
                                         np.concatenate(labels),
                                         np.concatenate(sessions),
                                         prices=prices)

    def evaluate_with_scores(self, scores: np.ndarray, labels: np.ndarray,
                             session_ids: np.ndarray,
                             prices: Optional[np.ndarray] = None
                             ) -> Dict[str, float]:
        rng = np.random.default_rng(self.seed + 404)
        scores = scores + rng.uniform(-1e-8, 1e-8, size=scores.shape)
        order = np.argsort(session_ids, kind="stable")
        s, l, g = scores[order], labels[order], session_ids[order]
        p = prices[order] if prices is not None else None
        bounds = np.flatnonzero(np.r_[True, g[1:] != g[:-1], True])
        res: Dict[str, List[float]] = {m: [] for m in self.metric_names}

        def _rndcg(k, ranks, ndcg_w, rank_prices):
            # sessionwise.py:44-50: GMV-weighted NDCG — numerator pairs each
            # hit positive's discount with its price; the ideal denominator
            # pairs the largest discounts with the largest prices
            n = min(k, len(ranks))
            hit = ranks < k
            num = (ndcg_w[ranks[hit]] * rank_prices[hit]).sum()
            den = (ndcg_w[:n] * np.sort(rank_prices)[::-1][:n]).sum() + 1e-8
            return num / den

        for a, b in zip(bounds[:-1], bounds[1:]):
            gs, gl = s[a:b], l[a:b]
            n_pos = gl.sum()
            if n_pos <= 0 or n_pos == len(gl):
                continue
            order_desc = np.argsort(-gs, kind="stable")
            ranks_full = np.empty(len(gs), dtype=np.int64)
            ranks_full[order_desc] = np.arange(len(gs))
            pos_ranks = ranks_full[gl > 0]
            rank_order = np.argsort(pos_ranks)
            ranks = pos_ranks[rank_order]
            # positives' prices in rank order (sessionwise.py:160-162)
            rank_prices = (p[a:b][gl > 0][rank_order]
                           if p is not None else None)
            n = len(gs)
            ndcg_w = 1.0 / np.log2(np.arange(2, n + 2))
            mrr_w = 1.0 / np.arange(1, n + 1)
            for m in self.metric_names:
                if m == "group_auc":
                    res[m].append(M.roc_auc(gl, gs))
                elif m == "ndcg":
                    res[m].append(ndcg_w[ranks].sum() / ndcg_w[: len(ranks)].sum())
                elif m == "rndcg":
                    # k=Inf (sessionwise.py:172): ranks can exceed the
                    # positive count, so no finite k shortcut
                    res[m].append(_rndcg(np.inf, ranks, ndcg_w,
                                         rank_prices))
                elif m == "mrr":
                    res[m].append(mrr_w[ranks].sum() / len(ranks))
                elif "@" in m:
                    name, k = m.split("@")
                    k = int(k)
                    if name == "ndcg":
                        nn_ = min(k, len(ranks))
                        res[m].append(ndcg_w[ranks[ranks < k]].sum() / ndcg_w[:nn_].sum())
                    elif name == "rndcg":
                        res[m].append(_rndcg(k, ranks, ndcg_w, rank_prices))
                    elif name == "hit":
                        res[m].append(1.0 if ranks[0] < k else 0.0)
                    elif name == "rhit":
                        # max-price hit positive (sessionwise.py:63-65)
                        res[m].append(float(((ranks < k) * rank_prices).max()))
                    elif name == "recall":
                        res[m].append((ranks < k).sum() / len(ranks))
                    elif name == "rrecall":
                        # price mass of hit positives (sessionwise.py:81-83)
                        res[m].append(float(((ranks < k) * rank_prices).sum()))
                    elif name == "mrr":
                        nn_ = min(k, len(ranks))
                        res[m].append(mrr_w[ranks[ranks < k]].sum() / nn_)
        return {m: float(np.mean(v)) if v else 0.0 for m, v in res.items()}


def build_evaluator(config: Dict[str, Any], model, protocol: str,
                    data_format: Optional[str] = None, mesh=None):
    """Protocol × format dispatch (trainer.py:100-131)."""
    if protocol == EvalProtocol.SESSION_AWARE.value:
        return SessionWiseEvaluator(config, model, mesh)
    if protocol == EvalProtocol.ONE_VS_ALL.value and data_format in (
            DataFormat.T5.value, DataFormat.T6.value):
        return MultiPositiveEvaluator(config, model, mesh)
    if protocol in (EvalProtocol.ONE_VS_ALL.value, EvalProtocol.ONE_VS_K.value,
                    EvalProtocol.LABEL_AWARE.value):
        return OnePositiveEvaluator(config, model, mesh)
    raise ValueError(f"protocol/format mismatch: {protocol} / {data_format}")
