"""Packed user-history store.

The reference keeps user histories as an object-dtype ndarray of ragged
ndarrays (general.py:111-150) and does per-sample Python work on them
(adduserhistory.py). Here histories live in one right-padded int32 matrix
``items[n_users, capacity]`` + ``lengths[n_users]`` so that every batch
operation (history gather, target masking, autoregressive truncation,
left-pad windowing, membership tests for negative-sample rejection and
full-catalog masking) is a vectorized numpy/XLA op with static shapes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd

from unirec_tpu.constants import DataFormat, HistoryMaskMode


class UserHistory:
    def __init__(self, items: np.ndarray, lengths: np.ndarray,
                 times: Optional[np.ndarray] = None):
        assert items.ndim == 2 and lengths.shape == (items.shape[0],)
        self.items = items.astype(np.int32, copy=False)
        self.lengths = lengths.astype(np.int32, copy=False)
        self.times = times if times is None else times.astype(np.int32, copy=False)
        # sorted copy for O(log n) membership tests
        self._sorted = np.sort(self.items, axis=1)

    @property
    def n_users(self) -> int:
        return self.items.shape[0]

    @property
    def capacity(self) -> int:
        return self.items.shape[1]

    # ------------------------------------------------------------------ build
    @staticmethod
    def load(path_prefix: str, n_users: int, fmt: str, capacity: int = -1,
             with_time: bool = False) -> "UserHistory":
        """Load from ``<prefix>.{ftr,pkl,tsv,csv,txt}``: tries the native
        packed parser (fully vectorized build, no per-row Python), falls
        back to load_table + from_dataframe."""
        from unirec_tpu.utils import file_io
        if fmt in (DataFormat.T5.value, DataFormat.T6.value,
                   DataFormat.T5_1.value):
            packed = file_io.load_table_packed(path_prefix)
            if packed is not None:
                return UserHistory.from_packed(packed, n_users, fmt,
                                               capacity=capacity,
                                               with_time=with_time)
        return UserHistory.from_dataframe(
            file_io.load_table(path_prefix), n_users, fmt,
            capacity=capacity, with_time=with_time)

    @staticmethod
    def from_packed(packed, n_users: int, fmt: str, capacity: int = -1,
                    with_time: bool = False) -> "UserHistory":
        """Vectorized build from the native parser's packed columns
        (T5/T6 item_seq tables). Same semantics as from_dataframe: keep
        the LAST ``max_len`` items per user; duplicate user rows — later
        row wins."""
        uids = packed["scalars"]["user_id"].astype(np.int64)
        flat, lens = packed["lists"]["item_seq"]
        ok = (uids >= 0) & (uids < n_users)
        # max_len over SURVIVING rows only ('later row wins'): a dropped
        # earlier duplicate must not widen the array vs from_dataframe.
        ok_idx = np.nonzero(ok)[0]
        if ok_idx.size:
            rev = ok_idx[::-1]
            _, first_in_rev = np.unique(uids[rev], return_index=True)
            surviving = rev[first_in_rev]
            max_len = int(lens[surviving].max())
        else:
            max_len = 1
        if capacity is not None and capacity > 0:
            max_len = min(max_len, capacity)
        max_len = max(max_len, 1)

        offsets = np.concatenate([[0], np.cumsum(lens[:-1])]) if len(lens) \
            else np.zeros(0, np.int64)
        keep = np.minimum(lens, max_len)
        start = lens - keep
        j = np.arange(max_len)
        valid = j[None, :] < keep[:, None]
        src = offsets[:, None] + start[:, None] + j[None, :]
        rows = np.zeros((len(uids), max_len), np.int64)
        rows[valid] = flat[src[valid]]

        items = np.zeros((n_users, max_len), dtype=np.int32)
        lengths = np.zeros(n_users, dtype=np.int32)
        items[uids[ok]] = rows[ok]
        lengths[uids[ok]] = keep[ok]
        times = None
        if with_time:
            times = np.zeros_like(items)
            if fmt == DataFormat.T6.value and "time_seq" in packed["lists"]:
                tf, tl = packed["lists"]["time_seq"]
                toff = np.concatenate([[0], np.cumsum(tl[:-1])]) if len(tl) \
                    else np.zeros(0, np.int64)
                tkeep = np.minimum(tl, max_len)
                tvalid = j[None, :] < tkeep[:, None]
                tsrc = toff[:, None] + (tl - tkeep)[:, None] + j[None, :]
                trows = np.zeros((len(uids), max_len), np.int64)
                trows[tvalid] = tf[tsrc[tvalid]]
                times[uids[ok]] = trows[ok]
        return UserHistory(items, lengths, times)

    @staticmethod
    def from_dataframe(df: pd.DataFrame, n_users: int, fmt: str,
                       capacity: int = -1, with_time: bool = False) -> "UserHistory":
        """Build from a T1/T3 (grouped) or T5/T6 (item_seq column) table
        (reference general.load_user_history semantics)."""
        seqs = [None] * n_users
        tseqs = [None] * n_users if with_time else None
        if fmt in (DataFormat.T5.value, DataFormat.T6.value, DataFormat.T5_1.value):
            for row in df.itertuples(index=False):
                uid = int(row.user_id)
                if 0 <= uid < n_users:
                    seqs[uid] = np.asarray(row.item_seq, dtype=np.int64)
                    if with_time and fmt == DataFormat.T6.value:
                        tseqs[uid] = np.asarray(row.time_seq, dtype=np.int64)
        elif fmt in (DataFormat.T1.value, DataFormat.T3.value):
            grouped = df.groupby("user_id")["item_id"].apply(lambda x: np.asarray(x))
            for uid, items in grouped.items():
                if 0 <= uid < n_users:
                    seqs[uid] = items
            if with_time and fmt == DataFormat.T3.value:
                gt = df.groupby("user_id")["rating"].apply(lambda x: np.asarray(x))
                for uid, t in gt.items():
                    if 0 <= uid < n_users:
                        tseqs[uid] = t
        else:
            raise ValueError(f"unsupported user history format: {fmt}")

        max_len = max((len(s) for s in seqs if s is not None), default=1)
        if capacity is not None and capacity > 0:
            max_len = min(max_len, capacity)
        items = np.zeros((n_users, max(max_len, 1)), dtype=np.int32)
        lengths = np.zeros(n_users, dtype=np.int32)
        times = np.zeros_like(items) if with_time else None
        for uid, s in enumerate(seqs):
            if s is None or len(s) == 0:
                continue
            s = s[-max_len:]
            items[uid, : len(s)] = s
            lengths[uid] = len(s)
            if with_time and tseqs[uid] is not None:
                t = tseqs[uid][-max_len:]
                times[uid, : len(t)] = t
        return UserHistory(items, lengths, times)

    # ------------------------------------------------------------- membership
    def contains(self, user_ids: np.ndarray, item_ids: np.ndarray) -> np.ndarray:
        """Vectorized membership test: result[i, ...] = item_ids[i, ...] in
        history(user_ids[i]). item_ids may be [B] or [B, K]."""
        rows = self._sorted[np.clip(user_ids, 0, self.n_users - 1)]  # [B, C]
        squeeze = item_ids.ndim == 1
        q = item_ids[:, None] if squeeze else item_ids      # [B, K]
        idx = np.empty(q.shape, dtype=np.int64)
        for b in range(0, rows.shape[0], 8192):             # chunk to bound temp memory
            sl = slice(b, min(b + 8192, rows.shape[0]))
            idx[sl] = _rowwise_searchsorted(rows[sl], q[sl])
        idx = np.minimum(idx, rows.shape[1] - 1)
        found = np.take_along_axis(rows, idx, axis=1) == q
        found &= q > 0  # padding/zero item never counts
        in_range = ((user_ids >= 0) & (user_ids < self.n_users))[:, None]
        found &= in_range
        return found[:, 0] if squeeze else found

    # ------------------------------------------------------------- batch view
    def gather(self, user_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Raw packed rows + lengths for a batch of users."""
        uid = np.clip(user_ids, 0, self.n_users - 1)
        valid = (user_ids >= 0) & (user_ids < self.n_users)
        rows = self.items[uid] * valid[:, None]
        lens = self.lengths[uid] * valid
        return rows, lens

    def window(self, user_ids: np.ndarray, max_seq_len: int,
               drop_last: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Left-padded history windows for inference (inferdataset.py:44-67):
        optionally drop the trailing ``drop_last`` items (the reference's
        ``last_item`` offset), then right-align the last ``max_seq_len``."""
        rows, lens = self.gather(user_ids)
        n = np.maximum(lens.astype(np.int64) - int(drop_last), 0)
        L = max_seq_len
        grid = n[:, None] - L + np.arange(L)[None, :]
        valid = grid >= 0
        gi = np.clip(grid, 0, max(rows.shape[1] - 1, 0))
        seq = np.take_along_axis(rows, gi, axis=1) * valid
        return seq.astype(np.int32), np.minimum(n, L).astype(np.int32)

    def sequence_batch(
        self,
        user_ids: np.ndarray,
        target_items: np.ndarray,
        max_seq_len: int,
        mask_mode: str = HistoryMaskMode.UNORDER.value,
        seq_last: bool = False,
        rng: Optional[np.random.Generator] = None,
        explicit_max_len: Optional[np.ndarray] = None,
        with_time: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Produce (item_seq [B, max_seq_len] left-padded, item_seq_len [B],
        time_seq or None) replicating AddUserHistory + SeqRecDataset._padding:

        - unorder: occurrences of the target(s) are zeroed in place
          (adduserhistory.py:50-55);
        - autoregressive: history truncated before a random (or last)
          occurrence of the target (adduserhistory.py:56-73); for T1_1 an
          explicit per-row max_len is used instead;
        - the last ``max_seq_len`` items of the (possibly truncated) history
          are right-aligned into a zero-padded window (seqrecdataset.py:60-68);
        - item_seq_len = min(prefix_len, max_seq_len)  — note the reference
          returns the *untruncated* length capped at max_seq_len
          (seqrecdataset.py:47).
        """
        B = len(user_ids)
        rows, lens = self.gather(user_ids)
        trows = self.times[np.clip(user_ids, 0, self.n_users - 1)] if (with_time and self.times is not None) else None

        tgt = target_items if target_items.ndim == 2 else target_items[:, None]  # [B, P]
        eq = rows[:, :, None] == tgt[:, None, :]          # [B, C, P]
        is_tgt = eq.any(-1) & (rows > 0)                  # [B, C]

        if mask_mode == HistoryMaskMode.UNORDER.value:
            rows = np.where(is_tgt, 0, rows)
            if trows is not None:
                trows = np.where(is_tgt, 0, trows)
            n = lens
        elif mask_mode == HistoryMaskMode.AUTOREGRESSIVE.value:
            if explicit_max_len is not None:
                n = np.minimum(explicit_max_len.astype(np.int64), lens)
            else:
                # position mask limited to the real length
                pos_mask = is_tgt & (np.arange(rows.shape[1])[None, :] < lens[:, None])
                counts = pos_mask.sum(1)
                if seq_last:
                    # index of last occurrence
                    rev_first = rows.shape[1] - 1 - pos_mask[:, ::-1].argmax(1)
                    n = np.where(counts > 0, rev_first, lens)
                else:
                    rng = rng or np.random.default_rng(0)
                    r = rng.integers(0, np.maximum(counts, 1))
                    csum = np.cumsum(pos_mask, axis=1)
                    # first position where cumulative count exceeds r
                    sel = (csum > r[:, None]) & pos_mask
                    first = sel.argmax(1)
                    n = np.where(counts > 0, first, lens)
        else:
            raise ValueError(f"unknown history mask mode: {mask_mode}")

        L = max_seq_len
        # window indices: j-th output slot reads input position n - L + j
        grid = n[:, None] - L + np.arange(L)[None, :]
        valid = grid >= 0
        gi = np.clip(grid, 0, max(rows.shape[1] - 1, 0))
        seq = np.take_along_axis(rows, gi, axis=1) * valid
        seq_len = np.minimum(n, L).astype(np.int32)
        tseq = None
        if trows is not None:
            tseq = np.take_along_axis(trows, gi, axis=1) * valid
        return seq.astype(np.int32), seq_len, tseq


def _rowwise_searchsorted(rows: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Per-row searchsorted using one flat searchsorted over offset rows."""
    B, C = rows.shape
    span = max(int(rows.max(initial=0)), int(queries.max(initial=0))) + 2
    offs = (np.arange(B, dtype=np.int64) * span)[:, None]
    flat = (rows.astype(np.int64) + offs).ravel()
    q = (queries.astype(np.int64) + offs)
    idx = np.searchsorted(flat, q.ravel()).reshape(q.shape) - np.arange(B)[:, None] * C
    return np.clip(idx, 0, C)
