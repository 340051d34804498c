"""Vectorized dynamic negative sampling.

Replaces the reference's per-sample retry loop (addnegsamples.py:90-115,
100 retries per slot, alias-method sampler in sampling.py:9-31) with a
batched oversample-and-first-valid scheme: for every negative slot we draw
``oversample_factor`` candidates, reject those that hit the user's history or
the in-row positives, and keep the first surviving candidate. Conditional on
at least one survivor the kept sample follows exactly the same distribution
as the reference's retry loop (i.i.d. proposals, first accepted wins); when
all proposals fail the slot falls back to item 0, mirroring the reference's
exhausted-retries behavior (addnegsamples.py:101,107).

Popularity^alpha sampling uses an O(1) alias table built once.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from unirec_tpu.data.history import UserHistory


class AliasTable:
    """Walker alias method for O(1) weighted sampling, vectorized draws."""

    def __init__(self, weights: np.ndarray):
        w = np.asarray(weights, dtype=np.float64)
        total = w.sum()
        if total <= 0:
            raise ValueError("alias table needs positive total weight")
        n = len(w)
        prob = w * n / total
        alias = np.zeros(n, dtype=np.int64)
        thresh = np.ones(n, dtype=np.float64)
        small = [i for i in range(n) if prob[i] < 1.0]
        large = [i for i in range(n) if prob[i] >= 1.0]
        while small and large:
            s, l = small.pop(), large.pop()
            thresh[s] = prob[s]
            alias[s] = l
            prob[l] -= 1.0 - prob[s]
            (small if prob[l] < 1.0 else large).append(l)
        self.thresh = thresh
        self.alias = alias
        self.n = n

    def sample(self, rng: np.random.Generator, shape) -> np.ndarray:
        idx = rng.integers(0, self.n, size=shape)
        frac = rng.random(size=shape)
        return np.where(frac < self.thresh[idx], idx, self.alias[idx])


class NegativeSampler:
    def __init__(self, n_items: int, n_neg: int,
                 user_history: Optional[UserHistory] = None,
                 item_popularity: Optional[np.ndarray] = None,
                 neg_by_pop_alpha: float = 1.0,
                 oversample_factor: int = 4):
        self.n_items = n_items
        self.n_neg = n_neg
        self.history = user_history
        self.oversample = max(int(oversample_factor), 1)
        self.alias: Optional[AliasTable] = None
        if item_popularity is not None:
            w = np.power(np.asarray(item_popularity, dtype=np.float64), neg_by_pop_alpha)
            w[0] = 0.0  # item 0 is the padding item (addnegsamples.py:64)
            self.alias = AliasTable(w)

    def _draw(self, rng: np.random.Generator, shape) -> np.ndarray:
        if self.alias is not None:
            return self.alias.sample(rng, shape)
        # uniform over [1, n_items-1] (addnegsamples.py:76)
        return rng.integers(1, self.n_items, size=shape)

    def __call__(self, rng: np.random.Generator, user_ids: np.ndarray,
                 pos_items: np.ndarray) -> np.ndarray:
        """Sample negatives.

        Args:
            user_ids: [B]
            pos_items: [B] or [B, P] positive items of each row.
        Returns:
            [B, n_neg] int32 negatives (0 where sampling failed).
        """
        B = len(user_ids)
        K = self.n_neg * self.oversample
        cand = self._draw(rng, (B, K)).astype(np.int64)    # [B, K]

        pos = pos_items if pos_items.ndim == 2 else pos_items[:, None]
        bad = (cand[:, :, None] == pos[:, None, :]).any(-1)
        if self.history is not None:
            bad |= self.history.contains(user_ids, cand)
        ok = ~bad

        # choose first valid candidate within each group of `oversample`
        cand = cand.reshape(B, self.n_neg, self.oversample)
        ok = ok.reshape(B, self.n_neg, self.oversample)
        first = ok.argmax(-1)                               # 0 if none valid
        any_ok = ok.any(-1)
        chosen = np.take_along_axis(cand, first[..., None], axis=-1)[..., 0]
        return np.where(any_ok, chosen, 0).astype(np.int32)
