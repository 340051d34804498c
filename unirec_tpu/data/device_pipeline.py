"""Device-side batch augmentation: the TPU-native data path.

The host pipeline (sampler.py + history.py) assembles ~150k rows/s — 150x
slower than the ~25M rows/s a single chip trains at, so at production batch
sizes the host, not the TPU, is the bottleneck. This module moves the
per-batch work onto the device, *inside* the jitted train step: the host
feeds only raw ``(user_id, item_id)`` int32 pairs (a few hundred KB/s) and
everything else — popularity^alpha negative sampling with user-history
rejection, autoregressive history truncation, left-padded windowing — runs
as fused XLA ops on arrays resident in HBM.

Semantics mirror the host pipeline exactly (same oversample+first-valid
rejection as sampler.py:84-115, same truncation/window rules as
history.py:111-181), so either path can feed the same models; tests
cross-check the two.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from unirec_tpu.data.history import UserHistory
from unirec_tpu.data.sampler import AliasTable


class DeviceAugmenter:
    """Holds device-resident state (packed history, alias table) and exposes
    ``augment(batch, rng)`` — a pure jittable function.

    IMPORTANT: the tables are passed into the jitted step as the ``state``
    pytree operand (``augment``'s batch carries them via ``with_state``),
    never captured as closure constants — XLA would otherwise inline a
    multi-MB table into the executable and compile times explode."""

    def __init__(self, config: Dict[str, Any], history: UserHistory,
                 item_popularity: Optional[np.ndarray] = None):
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

        self.state: Dict[str, jnp.ndarray] = {
            "hist_items": jnp.asarray(history.items),   # [U, C] int32, HBM
            "hist_lens": jnp.asarray(history.lengths),  # [U]
        }
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

    def _membership(self, rows, cand):
        """cand[b, k] in rows[b, :] — [B, K] bool."""
        hit = (cand[:, :, None] == rows[:, None, :]) & (cand[:, :, None] > 0)
        return hit.any(-1)

    def sample_negatives(self, state, key, rows, pos):
        """[B, n_neg] negatives: oversample, reject in-history / == positive,
        keep first valid (sampler.py semantics; 0 when all proposals fail)."""
        B = pos.shape[0]
        K = self.n_neg * self.oversample
        cand = self._draw(state, key, (B, K))
        bad = cand == pos[:, None]
        bad |= self._membership(rows, cand)
        ok = ~bad
        cand = cand.reshape(B, self.n_neg, self.oversample)
        ok = ok.reshape(B, self.n_neg, self.oversample)
        first = jnp.argmax(ok, axis=-1)
        chosen = jnp.take_along_axis(cand, first[..., None], axis=-1)[..., 0]
        return jnp.where(ok.any(-1), chosen, 0).astype(jnp.int32)

    def history_window(self, key, rows, lens, pos):
        """(item_seq [B, L], item_seq_len [B]) with the host pipeline's
        unorder / autoregressive semantics (history.py:111-181)."""
        B, C = rows.shape
        L = self.max_seq_len
        is_tgt = (rows == pos[:, None]) & (rows > 0)
        if self.mask_mode == "unorder":
            rows = jnp.where(is_tgt, 0, rows)
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
        seq = jnp.take_along_axis(rows, gi, axis=1) * valid
        return seq.astype(jnp.int32), jnp.minimum(n, L).astype(jnp.int32)

    # ------------------------------------------------------------------
    def with_state(self, raw: Dict[str, Any]) -> Dict[str, Any]:
        """Attach the device tables to a raw batch so they travel as jit
        operands (under the '_aug' key, stripped by ``augment``)."""
        out = dict(raw)
        out["_aug"] = self.state
        return out

    def augment(self, raw: Dict[str, Any], key) -> Dict[str, jnp.ndarray]:
        """raw: {user_id [B], item_id [B], weight [B], _aug: state} → full
        train batch."""
        raw = dict(raw)
        state = raw.pop("_aug", self.state)
        uid = raw["user_id"]
        pos = raw["item_id"]
        rows = state["hist_items"][uid]
        lens = state["hist_lens"][uid]
        k_neg, k_seq = jax.random.split(key)

        batch = {"user_id": uid, "weight": raw["weight"]}
        if self.n_neg > 0:
            negs = self.sample_negatives(state, k_neg, rows, pos)
            item_id = jnp.concatenate([pos[:, None], negs], axis=1)
            label = jnp.zeros(item_id.shape, jnp.float32).at[:, 0].set(1.0)
        else:
            item_id = pos
            label = jnp.ones(pos.shape, jnp.float32)
        batch["item_id"] = item_id
        batch["label"] = label
        if self.is_sequential:
            seq, seq_len = self.history_window(k_seq, rows, lens, pos)
            batch["item_seq"] = seq
            batch["item_seq_len"] = seq_len
        return batch


class RawIdBatcher:
    """Minimal host loop for the device pipeline: shuffle + slice the raw
    (user_id, item_id) columns; all augmentation happens on device."""

    def __init__(self, user_id: np.ndarray, item_id: np.ndarray,
                 batch_size: int, seed: int = 2022, shuffle: bool = True):
        self.user_id = user_id.astype(np.int32)
        self.item_id = item_id.astype(np.int32)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.shuffle = shuffle
        self._epoch = 0

    def __len__(self):
        return (len(self.user_id) + self.batch_size - 1) // self.batch_size

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
            yield {"user_id": self.user_id[idx], "item_id": self.item_id[idx],
                   "weight": weight}
