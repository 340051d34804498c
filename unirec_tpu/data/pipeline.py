"""Static-shape batch assembly.

Produces dict batches of fixed-shape numpy arrays ready to be put on device.
This replaces the reference's torch DataLoader + per-sample transforms
(main.py:121-202): shuffling, negative sampling, history windows and padding
are all vectorized per batch. The final partial batch is padded to the full
batch size and flagged by a per-row ``weight`` (1 real / 0 pad) so jit'd
programs see one shape per epoch.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np

from unirec_tpu.constants import DataFormat, EvalProtocol, HistoryMaskMode, LossType
from unirec_tpu.data.datasets import BaseDataset
from unirec_tpu.data.history import UserHistory
from unirec_tpu.data.sampler import NegativeSampler


class Batcher:
    def __init__(
        self,
        dataset: BaseDataset,
        config: Dict[str, Any],
        history: Optional[UserHistory] = None,
        sampler: Optional[NegativeSampler] = None,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        seed: int = 2022,
        features: Optional[np.ndarray] = None,
    ):
        self.ds = dataset
        self.config = config
        self.history = history
        self.sampler = sampler
        self.batch_size = int(batch_size or config.get("batch_size", 256))
        self.shuffle = shuffle
        # every __iter__ derives a fresh rng from (seed, epoch) so epochs are
        # individually deterministic and safe to assemble from a prefetch
        # thread (no shared mutable rng state between concurrent iterators)
        self.seed = int(seed)
        self._epoch = 0
        self.rng = np.random.default_rng(seed)  # kept for ad-hoc callers
        self.features = features
        self.max_seq_len = int(config.get("max_seq_len", 10))
        self.mask_mode = config.get("history_mask_mode", HistoryMaskMode.UNORDER.value)
        self.seq_last = bool(config.get("seq_last", 0))
        self.with_time = bool(config.get("time_seq", 0))
        self.pad_incomplete = bool(config.get("pad_incomplete_batch", True))

    def __len__(self) -> int:
        n, b = len(self.ds), self.batch_size
        if n == 0:
            return 0
        return (n + b - 1) // b if self.pad_incomplete else max(n // b, (n + b - 1) // b if n < b else n // b)

    def _next_rng(self) -> np.random.Generator:
        rng = np.random.default_rng([self.seed, self._epoch])
        self._epoch += 1
        return rng

    def set_epoch(self, epoch: int):
        """Fast-forward the per-epoch rng counter (auto_resume: a resumed
        run must shuffle/sample epoch k exactly like the original run)."""
        self._epoch = int(epoch)

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = self._next_rng()
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            order = rng.permutation(n)
        b = self.batch_size
        for start in range(0, n, b):
            idx = order[start:start + b]
            pad = b - len(idx)
            weight = np.ones(b, dtype=np.float32)
            if pad > 0:
                if not self.pad_incomplete and n >= b:
                    break
                weight[len(idx):] = 0.0
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            yield self._assemble(idx, weight, rng)

    # ------------------------------------------------------------------
    def _assemble(self, idx: np.ndarray, weight: np.ndarray,
                  rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
        rng = rng if rng is not None else self.rng
        ds, cols = self.ds, self.ds.cols
        batch: Dict[str, np.ndarray] = {"weight": weight}

        if ds.fmt == "aerec-train":
            hist = cols["hist"][idx]
            cap = int(self.config.get("aerec_max_hist", hist.shape[1]) or hist.shape[1])
            batch["user_id"] = cols["user_id"][idx].astype(np.int32)
            batch["item_seq"] = hist[:, :cap].astype(np.int32)
            batch["item_seq_len"] = np.minimum(cols["hist_len"][idx], cap).astype(np.int32)
            if self.features is not None:
                batch["item_seq_features"] = self.features[batch["item_seq"]]
            return batch

        if ds.fmt == DataFormat.T7.value or "index_list" in cols:
            for k in ("index_list", "value_list", "label"):
                if k in cols:
                    batch[k] = cols[k][idx]
            batch["label"] = batch["label"].astype(np.float32)
            if "session_id" in cols:
                batch["session_id"] = cols["session_id"][idx].astype(np.int64)
            return batch

        user_id = cols["user_id"][idx].astype(np.int64)
        item_id = cols["item_id"][idx]
        label = cols.get("label")
        label = None if label is None else label[idx]

        # dynamic negative sampling → grouped items/labels
        if self.sampler is not None and self.sampler.n_neg > 0:
            pos = item_id
            negs = self.sampler(rng, user_id, pos)
            if pos.ndim == 1:
                item_id = np.concatenate([pos[:, None], negs], axis=1)
            else:
                item_id = np.concatenate([pos, negs], axis=1)
            g = item_id.shape[1]
            lab = np.zeros((len(idx), g), dtype=np.float32)
            p = pos.shape[1] if pos.ndim == 2 else 1
            if label is not None and label.ndim == 1:
                lab[:, 0] = label
            else:
                lab[:, :p] = 1.0 if label is None else label
            label = lab
        elif label is None:
            # implicit positive label (basedataset.py:138-148)
            if item_id.ndim == 2:
                label = np.zeros(item_id.shape, dtype=np.float32)
                label[:, 0] = 1.0
            else:
                label = np.ones(len(idx), dtype=np.float32)

        batch["user_id"] = user_id.astype(np.int32)
        batch["item_id"] = item_id.astype(np.int32)
        batch["label"] = label.astype(np.float32)
        for k in ("session_id", "max_len"):
            if k in cols:
                batch[k] = cols[k][idx].astype(np.int64)

        if self.features is not None:
            batch["item_features"] = self.features[batch["item_id"]]

        if ds.is_sequential and self.history is not None:
            explicit = batch.get("max_len")
            seq, seq_len, tseq = self.history.sequence_batch(
                user_id,
                cols["item_id"][idx] if cols["item_id"].ndim == 2 else cols["item_id"][idx],
                self.max_seq_len,
                mask_mode=self.mask_mode,
                seq_last=self.seq_last,
                rng=rng,
                explicit_max_len=explicit,
                with_time=self.with_time,
            )
            batch["item_seq"] = seq
            batch["item_seq_len"] = seq_len
            if tseq is not None:
                batch["time_seq"] = tseq
            if self.features is not None:
                batch["item_seq_features"] = self.features[seq]

        return batch


class PrefetchBatcher:
    """Double-buffered host-side pipeline: batch assembly (shuffling,
    negative sampling, history windowing — all numpy) runs in a background
    thread while the device executes the previous step. Plays the role of
    the reference's DataLoader worker processes (main.py:126,198) without
    process forking; ``depth`` bounds the queue so memory stays constant."""

    def __init__(self, batcher, depth: int = 2):
        self.batcher = batcher
        self.depth = max(int(depth), 1)

    def __len__(self):
        return len(self.batcher)

    def __getattr__(self, name):
        return getattr(self.batcher, name)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        err: list = []
        stop = threading.Event()

        def producer():
            try:
                for b in self.batcher:
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface worker errors in the consumer
                err.append(e)
            finally:
                # the END sentinel must not be dropped when the queue is full,
                # or the consumer blocks forever after draining it
                while not stop.is_set():
                    try:
                        q.put(_END, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            # abandoned iterators (e.g. `next(iter(...))` to peek a batch)
            # must not leak a blocked producer thread
            stop.set()
            t.join(timeout=5)
        if err:
            raise err[0]


def make_negative_sampler(config, history, item_popularity=None,
                          task: str = "train"):
    n_neg = int(config.get(f"n_sample_neg_{task}", 0) or 0)
    if task == "train" and config.get("loss_type") == LossType.FULLSOFTMAX.value:
        n_neg = 0
    if n_neg <= 0:
        return None
    pop = item_popularity if float(config.get("neg_by_pop_alpha", 0) or 0) > 0 else None
    return NegativeSampler(
        config["n_items"], n_neg, user_history=history,
        item_popularity=pop,
        neg_by_pop_alpha=float(config.get("neg_by_pop_alpha", 1.0) or 1.0),
        oversample_factor=int(config.get("neg_oversample_factor", 4)),
    )


def make_train_batcher(dataset, config, history, item_popularity=None, features=None):
    sampler = make_negative_sampler(config, history, item_popularity, "train")
    batcher = Batcher(dataset, config, history=history, sampler=sampler,
                      batch_size=config.get("batch_size"),
                      shuffle=bool(config.get("shuffle_train", 0)),
                      seed=int(config.get("seed", 2022)), features=features)
    depth = int(config.get("prefetch_batches", 2) or 0)
    return PrefetchBatcher(batcher, depth) if depth > 0 else batcher


def make_eval_batcher(dataset, config, history, task="test", item_popularity=None,
                      features=None):
    n_neg = int(config.get(f"n_sample_neg_{task}", 0) or 0)
    protocol = config.get("eval_protocol") or config.get(f"{task}_protocol")
    if protocol == EvalProtocol.ONE_VS_ALL.value:
        n_neg = 0
    sampler = None
    if n_neg > 0:
        pop = item_popularity if float(config.get("neg_by_pop_alpha", 0) or 0) > 0 else None
        sampler = NegativeSampler(
            config["n_items"], n_neg, user_history=history, item_popularity=pop,
            neg_by_pop_alpha=float(config.get("neg_by_pop_alpha", 1.0) or 1.0),
            oversample_factor=int(config.get("neg_oversample_factor", 4)))
    bs = config.get(f"{task}_batch_size") or config.get("test_batch_size") or config.get("batch_size")
    return Batcher(dataset, config, history=history, sampler=sampler,
                   batch_size=bs, shuffle=False,
                   seed=int(config.get("seed", 2022)) + 17, features=features)
