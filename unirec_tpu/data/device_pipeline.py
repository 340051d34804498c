"""Device-side batch augmentation: the TPU-native data path.

The host pipeline (sampler.py + history.py) assembles ~150k rows/s — far
slower than what a single chip trains at, so at production batch sizes the
host, not the TPU, is the bottleneck. This module moves the per-batch work
onto the device, *inside* the jitted train step: the host feeds only raw
id columns (a few hundred KB/s) and everything else — popularity^alpha
negative sampling with user-history rejection, autoregressive history
truncation, left-padded windowing, feature-table gathers, time-sequence
windows — runs as fused XLA ops on arrays resident in HBM.

Semantics mirror the host pipeline exactly (same oversample+first-valid
rejection as sampler.py:84-115, same truncation/window rules as
history.py:111-181, same grouped-row label assembly as pipeline.py:114-136),
so either path can feed the same models; tests cross-check the two.

Coverage (round 2): scalar rows, grouped T4 rows (2-D item_id + label),
categorical item features, T6 time sequences, T1_1 explicit max_len, and
AERec (autoencoder) training rows. Still host-only: T7 libFM rows
(index_list/value_list are ragged per-interaction features with no device
table to gather from) and the MoRec signal-driven sampler.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from unirec_tpu.data.history import UserHistory
from unirec_tpu.data.sampler import AliasTable


class DeviceAugmenter:
    """Holds device-resident state (packed history, alias table, feature
    table) and exposes ``augment(batch, rng)`` — a pure jittable function.

    IMPORTANT: the tables are passed into the jitted step as the ``state``
    pytree operand (``augment``'s batch carries them via ``with_state``),
    never captured as closure constants — XLA would otherwise inline a
    multi-MB table into the executable and compile times explode."""

    def __init__(self, config: Dict[str, Any], history: UserHistory,
                 item_popularity: Optional[np.ndarray] = None,
                 features: Optional[np.ndarray] = None,
                 aerec: bool = False):
        c = config
        self.n_items = int(c["n_items"])
        self.n_neg = int(c.get("n_sample_neg_train", 0) or 0)
        if c.get("loss_type") == "fullsoftmax":  # catalog is the negative set
            self.n_neg = 0
        self.oversample = max(int(c.get("neg_oversample_factor", 4)), 1)
        self.max_seq_len = int(c.get("max_seq_len", 10))
        self.mask_mode = c.get("history_mask_mode", "unorder")
        self.seq_last = bool(c.get("seq_last", 0))
        self.is_sequential = c.get("dataloader") in ("SeqRecDataset",)
        self.aerec = bool(aerec)
        self.aerec_cap = int(c.get("aerec_max_hist", 0) or 0)
        self.with_time = bool(int(c.get("time_seq", 0) or 0)) \
            and history.times is not None
        self.use_features = features is not None

        self.state: Dict[str, jnp.ndarray] = {
            "hist_items": jnp.asarray(history.items),   # [U, C] int32, HBM
            "hist_lens": jnp.asarray(history.lengths),  # [U]
        }
        # ascending per-user copy: negative-rejection membership as a
        # log2(C)-step binary search instead of the [B, K, C] compare.
        # MEASURED 110 ms/step SLOWER at bench shapes (dynamic-index wall,
        # docs/performance_notes.md) — opt-in for very long histories only.
        self.use_binary_membership = bool(
            int(c.get("neg_membership_binary_search", 0) or 0))
        if self.use_binary_membership and self.n_neg > 0:
            self.state["hist_sorted"] = jnp.asarray(
                np.sort(history.items, axis=1))
        # Pallas membership: identical results to the [B, K, C] broadcast
        # compare, but the history rows are read from HBM once per block
        # instead of once per candidate group (ops/member.py). Opt-in
        # measured lever (config neg_membership_pallas=1, TPU only).
        self.use_pallas_membership = bool(
            int(c.get("neg_membership_pallas", 0) or 0))
        if self.with_time:
            self.state["hist_times"] = jnp.asarray(history.times)
        if self.use_features:
            self.state["features"] = jnp.asarray(
                np.asarray(features, np.int32))          # [n_items, F]
        alpha = float(c.get("neg_by_pop_alpha", 0) or 0)
        self.use_alias = item_popularity is not None and alpha > 0
        if self.use_alias:
            w = np.power(np.asarray(item_popularity, np.float64), alpha)
            w[0] = 0.0
            table = AliasTable(w)
            self.state["alias_thresh"] = jnp.asarray(table.thresh, jnp.float32)
            self.state["alias_alias"] = jnp.asarray(table.alias, jnp.int32)

    # ------------------------------------------------------------------
    def _draw(self, state, key, shape):
        if not self.use_alias:
            return jax.random.randint(key, shape, 1, self.n_items)
        k1, k2 = jax.random.split(key)
        thresh, alias = state["alias_thresh"], state["alias_alias"]
        idx = jax.random.randint(k1, shape, 0, thresh.shape[0])
        frac = jax.random.uniform(k2, shape)
        return jnp.where(frac < thresh[idx], idx, alias[idx]).astype(jnp.int32)

    def _membership(self, rows, cand, sorted_rows=None):
        """cand[b, k] in rows[b, :] — [B, K] bool.

        With ``sorted_rows`` (a per-user ascending copy of the history,
        kept in the device state), membership is an unrolled binary search:
        ceil(log2(C)) take_along_axis steps over [B, K] index tensors
        instead of the [B, K, C] broadcast compare (236M compares at bench
        shapes, measured ~4 ms — ~8x its VPU roofline)."""
        if sorted_rows is None:
            if self.use_pallas_membership:
                from unirec_tpu.ops import member
                if member.member_supported(rows.shape[0], rows.shape[1],
                                           cand.shape[1]):
                    return member.member_mask(rows, cand)
            hit = (cand[:, :, None] == rows[:, None, :]) & (cand[:, :, None] > 0)
            return hit.any(-1)
        C = sorted_rows.shape[1]
        lo = jnp.zeros(cand.shape, jnp.int32)
        hi = jnp.full(cand.shape, C, jnp.int32)
        # lower-bound search over C elements needs ceil(log2(C+1)) halvings:
        # with exactly ceil(log2(C)) the interval can end at width 2 when C
        # is a power of two, missing in-history candidates (false negatives).
        steps = max(int(np.ceil(np.log2(C + 1))), 1)
        for _ in range(steps):
            mid = (lo + hi) // 2
            v = jnp.take_along_axis(sorted_rows, jnp.minimum(mid, C - 1),
                                    axis=1)
            go_right = v < cand
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        v = jnp.take_along_axis(sorted_rows, jnp.minimum(lo, C - 1), axis=1)
        return (v == cand) & (lo < C) & (cand > 0)

    def sample_negatives(self, state, key, rows, pos2d, sorted_rows=None):
        """[B, n_neg] negatives: oversample, reject in-history / == any
        positive column (sampler.py semantics; 0 when all proposals fail)."""
        B = pos2d.shape[0]
        K = self.n_neg * self.oversample
        cand = self._draw(state, key, (B, K))
        bad = (cand[:, :, None] == pos2d[:, None, :]).any(-1)
        bad |= self._membership(rows, cand, sorted_rows=sorted_rows)
        ok = ~bad
        cand = cand.reshape(B, self.n_neg, self.oversample)
        ok = ok.reshape(B, self.n_neg, self.oversample)
        first = jnp.argmax(ok, axis=-1)
        # unrolled select instead of take_along_axis over the (tiny)
        # oversample axis: XLA lowers the gather at ~14 ns/row (4.2 ms/step
        # at bench shapes, r5 trace fusion.5); oversample-1 vectorized
        # where's over [B, n_neg] are pure VPU and near-free
        chosen = cand[..., 0]
        for j in range(1, self.oversample):
            chosen = jnp.where(first == j, cand[..., j], chosen)
        return jnp.where(ok.any(-1), chosen, 0).astype(jnp.int32)

    def history_window(self, key, rows, lens, tgt2d, trows=None,
                       explicit_max_len=None):
        """(item_seq [B, L], item_seq_len [B], time_seq or None) with the
        host pipeline's unorder / autoregressive semantics
        (history.py:111-181); tgt2d: [B, P] positive items."""
        B, C = rows.shape
        L = self.max_seq_len
        is_tgt = (rows[:, :, None] == tgt2d[:, None, :]).any(-1) & (rows > 0)
        # explicit per-row max_len replaces target-based truncation only in
        # autoregressive mode (history.py:165-167, T1_1 semantics)
        if explicit_max_len is not None and self.mask_mode != "unorder":
            n = jnp.minimum(explicit_max_len.astype(jnp.int32), lens)
        elif self.mask_mode == "unorder":
            rows = jnp.where(is_tgt, 0, rows)
            if trows is not None:
                trows = jnp.where(is_tgt, 0, trows)
            n = lens
        else:  # autoregressive
            valid_pos = is_tgt & (jnp.arange(C)[None, :] < lens[:, None])
            counts = valid_pos.sum(-1)
            if self.seq_last:
                rev = C - 1 - jnp.argmax(jnp.flip(valid_pos, -1), -1)
                n = jnp.where(counts > 0, rev, lens)
            else:
                r = jax.random.randint(key, (B,), 0,
                                       jnp.maximum(counts, 1))
                csum = jnp.cumsum(valid_pos, axis=-1)
                sel = (csum > r[:, None]) & valid_pos
                first = jnp.argmax(sel, axis=-1)
                n = jnp.where(counts > 0, first, lens)
        grid = n[:, None] - L + jnp.arange(L)[None, :]
        valid = grid >= 0
        gi = jnp.clip(grid, 0, C - 1)
        if B * L * C <= 400_000_000:
            # windowing as a one-hot matmul instead of take_along_axis:
            # XLA's row-wise int gather measured 16.7 ms/step at bench
            # shapes (B=32k, C=200) while the [B, L, C] one-hot einsum
            # rides the MXU for ~3 ms (measured -12.6 ms/step end-to-end).
            # Item ids stay exact in f32 below 2^24. Above ~400M one-hot
            # elements the temporary breaks compilation — gather fallback.
            onehot = (gi[:, :, None] == jnp.arange(C)[None, None, :]) \
                & valid[:, :, None]
            sel = lambda r: jnp.einsum(
                "blc,bc->bl", onehot.astype(jnp.float32),
                r.astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            seq = sel(rows)
            tseq = sel(trows) if trows is not None else None
        else:
            seq = (jnp.take_along_axis(rows, gi, axis=1) * valid).astype(jnp.int32)
            tseq = None
            if trows is not None:
                tseq = (jnp.take_along_axis(trows, gi, axis=1)
                        * valid).astype(jnp.int32)
        return seq, jnp.minimum(n, L).astype(jnp.int32), tseq

    # ------------------------------------------------------------------
    def with_state(self, raw: Dict[str, Any]) -> Dict[str, Any]:
        """Attach the device tables to a raw batch so they travel as jit
        operands (under the '_aug' key, stripped by ``augment``)."""
        out = dict(raw)
        out["_aug"] = self.state
        return out

    def augment(self, raw: Dict[str, Any], key) -> Dict[str, jnp.ndarray]:
        """raw: {user_id [B], item_id [B] or [B, P], weight [B],
        label? [B or B, P], max_len? [B], _aug: state} → full train batch."""
        raw = dict(raw)
        state = raw.pop("_aug", self.state)
        uid = raw["user_id"]
        rows = state["hist_items"][uid]
        lens = state["hist_lens"][uid]
        trows = state["hist_times"][uid] if self.with_time else None
        batch = {"user_id": uid, "weight": raw["weight"]}

        if self.aerec:
            # AERec training rows (pipeline.py:90-98): the user's own
            # deduped history is both input and reconstruction target
            cap = self.aerec_cap or rows.shape[1]
            batch["item_seq"] = rows[:, :cap]
            batch["item_seq_len"] = jnp.minimum(lens, cap)
            if self.use_features:
                batch["item_seq_features"] = state["features"][batch["item_seq"]]
            return batch

        pos = raw["item_id"]
        pos2d = pos if pos.ndim == 2 else pos[:, None]
        in_label = raw.get("label")
        k_neg, k_seq = jax.random.split(key)

        if self.n_neg > 0:
            srows = state["hist_sorted"][uid] \
                if "hist_sorted" in state else None
            negs = self.sample_negatives(state, k_neg, rows, pos2d,
                                         sorted_rows=srows)
            item_id = jnp.concatenate([pos2d, negs], axis=1)
            # grouped-label assembly mirrors pipeline.py:122-129
            label = jnp.zeros(item_id.shape, jnp.float32)
            P = pos2d.shape[1]
            if in_label is None:
                label = label.at[:, :P].set(1.0)
            elif in_label.ndim == 1:
                label = label.at[:, 0].set(in_label.astype(jnp.float32))
            else:
                label = label.at[:, :P].set(in_label.astype(jnp.float32))
        else:
            item_id = pos
            if in_label is not None:
                label = in_label.astype(jnp.float32)
            elif pos.ndim == 2:
                label = jnp.zeros(pos.shape, jnp.float32).at[:, 0].set(1.0)
            else:
                label = jnp.ones(pos.shape, jnp.float32)
        batch["item_id"] = item_id
        batch["label"] = label
        if self.use_features:
            batch["item_features"] = state["features"][item_id]
        if self.is_sequential:
            seq, seq_len, tseq = self.history_window(
                k_seq, rows, lens, pos2d, trows=trows,
                explicit_max_len=raw.get("max_len"))
            batch["item_seq"] = seq
            batch["item_seq_len"] = seq_len
            if tseq is not None:
                batch["time_seq"] = tseq
            if self.use_features:
                batch["item_seq_features"] = state["features"][seq]
        return batch


class RawIdBatcher:
    """Minimal host loop for the device pipeline: shuffle + slice the raw id
    columns; all augmentation happens on device. ``extra`` columns (grouped
    item lists, labels, per-row max_len) ride along unchanged."""

    def __init__(self, user_id: np.ndarray, item_id: np.ndarray,
                 batch_size: int, seed: int = 2022, shuffle: bool = True,
                 extra: Optional[Dict[str, np.ndarray]] = None):
        self.user_id = user_id.astype(np.int32)
        self.item_id = item_id.astype(np.int32)
        self.extra = {k: np.asarray(v) for k, v in (extra or {}).items()}
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.shuffle = shuffle
        self._epoch = 0

    def __len__(self):
        return (len(self.user_id) + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Fast-forward the shuffle rng (auto_resume parity with Batcher)."""
        self._epoch = int(epoch)

    def __iter__(self):
        rng = np.random.default_rng([self.seed, self._epoch])
        self._epoch += 1
        n, b = len(self.user_id), self.batch_size
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, b):
            idx = order[start:start + b]
            pad = b - len(idx)
            weight = np.ones(b, np.float32)
            if pad:
                weight[len(idx):] = 0.0
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            out = {"user_id": self.user_id[idx], "item_id": self.item_id[idx],
                   "weight": weight}
            for k, v in self.extra.items():
                out[k] = v[idx]
            yield out
