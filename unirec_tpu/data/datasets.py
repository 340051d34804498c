"""Column-oriented datasets.

The reference stores interactions as pandas→object ndarrays and does
per-sample transforms in ``__getitem__`` (basedataset.py:160-205). For a TPU
pipeline everything is normalized at load time into packed numpy columns with
static widths, so batch assembly is pure slicing + vectorized ops.

Format handling mirrors basedataset.py:
  - T5/T6 are expanded to per-interaction rows for training or one-vs-k eval
    (basedataset.py:41-45);
  - rows with label==0 are dropped for one_vs_all / one_vs_k eval protocols
    on T2/T2_1 (basedataset.py:48-54);
  - unlabeled formats get an implicit positive label (basedataset.py:138-148).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from unirec_tpu.constants import ColNames, DataFormat, EvalProtocol
from unirec_tpu.utils import file_io
from unirec_tpu.utils.registry import register_dataset


def _pad_group(arrs, dtype, width: Optional[int] = None) -> np.ndarray:
    width = width or max((len(a) for a in arrs), default=1)
    out = np.zeros((len(arrs), width), dtype=dtype)
    for i, a in enumerate(arrs):
        a = np.asarray(a)[:width]
        out[i, : len(a)] = a
    return out


@register_dataset("BaseDataset")
class BaseDataset:
    """Holds normalized interaction columns.

    Attributes:
        cols: dict of numpy arrays, keys among {user_id, item_id, label,
            session_id, max_len, rating, index_list, value_list, group_len}.
            item_id/label are [N] scalars or [N, P] padded groups.
        fmt: effective data format after normalization.
    """

    is_sequential = False

    def __init__(self, config: Dict[str, Any], path: str, filename: str):
        self.config = config
        self.task = config.get("data_loader_task", "train")
        self.eval_protocol = config.get("eval_protocol")
        fmt = config["data_format"]
        self.fmt = fmt
        # packed fast path: the native parser hands flat+lengths arrays, so
        # padding/sequence-expansion below stays fully vectorized (no
        # per-row Python). Falls back to the DataFrame path for binary
        # files and anything the native parser declines.
        packed = file_io.load_table_packed(os.path.join(path, filename))
        if packed is not None:
            self._normalize_packed(packed)
        else:
            self._normalize(file_io.load_table(os.path.join(path, filename)))

    # ------------------------------------------------------------------
    def _normalize_packed(self, packed):
        from unirec_tpu.utils.fastio import pad_packed
        fmt = self.fmt
        sc, ls = packed["scalars"], packed["lists"]
        cols: Dict[str, np.ndarray] = {}

        if fmt in (DataFormat.T5.value, DataFormat.T6.value):
            flat, lens = ls["item_seq"]
            if self.task == "train" or self.eval_protocol == EvalProtocol.ONE_VS_K.value:
                # expand to per-interaction rows — vectorized repeat
                cols["user_id"] = np.repeat(sc["user_id"], lens).astype(np.int64)
                cols["item_id"] = flat.astype(np.int64)
                self.fmt = DataFormat.T1.value
            else:
                cols["user_id"] = sc["user_id"].astype(np.int64)
                cols["item_id"] = pad_packed(flat, lens, np.int64)
                if fmt == DataFormat.T6.value and "time_seq" in ls:
                    tf, tl = ls["time_seq"]
                    cols["time_seq_raw"] = pad_packed(tf, tl, np.int64)
        elif fmt == DataFormat.T7.value:
            cols["label"] = sc["label"].astype(np.float32)
            fi, li = ls["index_list"]
            fv, lv = ls["value_list"]
            cols["index_list"] = pad_packed(fi, li, np.int64)
            cols["value_list"] = pad_packed(fv, lv, np.float32)
            cols["feat_len"] = li.astype(np.int32)
        elif fmt == DataFormat.T4.value:
            cols["user_id"] = sc["user_id"].astype(np.int64)
            fi, li = ls["item_id_list"]
            fl, ll = ls["label_list"]
            cols["item_id"] = pad_packed(fi, li, np.int64)
            cols["label"] = pad_packed(fl.astype(np.float32), ll, np.float32)
        else:
            cols["user_id"] = sc["user_id"].astype(np.int64)
            cols["item_id"] = sc["item_id"].astype(np.int64)
            if fmt in (DataFormat.T2.value, DataFormat.T2_1.value) and "label" in sc:
                cols["label"] = sc["label"].astype(np.float32)
            if fmt == DataFormat.T2_1.value and "session_id" in sc:
                cols["session_id"] = sc["session_id"].astype(np.int64)
            if fmt == DataFormat.T3.value and "rating" in sc:
                cols["rating"] = sc["rating"].astype(np.float32)
            if fmt == DataFormat.T1_1.value and "max_len" in sc:
                cols["max_len"] = sc["max_len"].astype(np.int64)

        # label filtering for eval protocols (basedataset.py:48-54)
        if self.eval_protocol in (EvalProtocol.ONE_VS_ALL.value, EvalProtocol.ONE_VS_K.value) \
                and "label" in cols and cols["label"].ndim == 1 \
                and self.fmt in (DataFormat.T2.value, DataFormat.T2_1.value):
            keep = cols["label"] > 0
            cols = {k: v[keep] for k, v in cols.items()}

        self.cols = cols
        self.n_rows = next(iter(cols.values())).shape[0] if cols else 0

    # ------------------------------------------------------------------
    def _normalize(self, df):
        fmt = self.fmt
        cols: Dict[str, np.ndarray] = {}

        if fmt in (DataFormat.T5.value, DataFormat.T6.value):
            if self.task == "train" or self.eval_protocol == EvalProtocol.ONE_VS_K.value:
                # expand to per-interaction rows
                users, items = [], []
                for row in df.itertuples(index=False):
                    seq = np.asarray(row.item_seq)
                    users.append(np.full(len(seq), row.user_id, dtype=np.int64))
                    items.append(seq)
                cols["user_id"] = np.concatenate(users) if users else np.zeros(0, np.int64)
                cols["item_id"] = np.concatenate(items).astype(np.int64) if items else np.zeros(0, np.int64)
                self.fmt = DataFormat.T1.value
            else:
                cols["user_id"] = df["user_id"].to_numpy(np.int64)
                cols["item_id"] = _pad_group(df["item_seq"].tolist(), np.int64)
                if fmt == DataFormat.T6.value and "time_seq" in df:
                    cols["time_seq_raw"] = _pad_group(df["time_seq"].tolist(), np.int64)
        elif fmt == DataFormat.T7.value:
            cols["label"] = df["label"].to_numpy(np.float32)
            cols["index_list"] = _pad_group(df["index_list"].tolist(), np.int64)
            cols["value_list"] = _pad_group(df["value_list"].tolist(), np.float32)
            cols["feat_len"] = np.asarray([len(a) for a in df["index_list"]], np.int32)
        elif fmt == DataFormat.T4.value:
            cols["user_id"] = df["user_id"].to_numpy(np.int64)
            cols["item_id"] = _pad_group(df["item_id_list"].tolist(), np.int64)
            cols["label"] = _pad_group(df["label_list"].tolist(), np.float32)
        else:
            cols["user_id"] = df["user_id"].to_numpy(np.int64)
            cols["item_id"] = df["item_id"].to_numpy(np.int64)
            if fmt in (DataFormat.T2.value, DataFormat.T2_1.value) and "label" in df:
                cols["label"] = df["label"].to_numpy(np.float32)
            if fmt == DataFormat.T2_1.value and "session_id" in df:
                cols["session_id"] = df["session_id"].to_numpy(np.int64)
            if fmt == DataFormat.T3.value and "rating" in df:
                cols["rating"] = df["rating"].to_numpy(np.float32)
            if fmt == DataFormat.T1_1.value and "max_len" in df:
                cols["max_len"] = df["max_len"].to_numpy(np.int64)

        # label filtering for eval protocols (basedataset.py:48-54)
        if self.eval_protocol in (EvalProtocol.ONE_VS_ALL.value, EvalProtocol.ONE_VS_K.value) \
                and "label" in cols and cols["label"].ndim == 1 \
                and self.fmt in (DataFormat.T2.value, DataFormat.T2_1.value):
            keep = cols["label"] > 0
            cols = {k: v[keep] for k, v in cols.items()}

        self.cols = cols
        n = next(iter(cols.values())).shape[0] if cols else 0
        self.n_rows = n

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.n_rows

    @property
    def has_label(self) -> bool:
        return "label" in self.cols

    def positive_width(self) -> int:
        item = self.cols.get("item_id")
        return 1 if item is None or item.ndim == 1 else item.shape[1]


@register_dataset("SeqRecDataset")
class SeqRecDataset(BaseDataset):
    """Adds item_seq / item_seq_len at batch-assembly time (the packed
    UserHistory does the work; see pipeline.py)."""

    is_sequential = True


@register_dataset("AERecDataset")
class AERecDataset(SeqRecDataset):
    """For autoencoder training / solver models: groups interactions per user
    (aerecdataset.py:17-60). Training columns become user_id + a packed,
    deduplicated history matrix. Evaluation behaves like SeqRecDataset."""

    def _normalize(self, df):
        if self.task != "train":
            super()._normalize(df)
            return
        fmt = self.fmt
        if fmt == DataFormat.T4.value:
            df = df.explode(["item_id_list", "label_list"]).rename(
                columns={"item_id_list": "item_id", "label_list": "label"})
            fmt = DataFormat.T2.value
        if fmt in (DataFormat.T2.value, DataFormat.T2_1.value):
            df = df[df["label"] > 0]
        if fmt in (DataFormat.T1.value, DataFormat.T1_1.value, DataFormat.T2.value,
                   DataFormat.T2_1.value, DataFormat.T3.value):
            grouped = df.groupby("user_id")["item_id"].apply(
                lambda x: np.unique(np.asarray(x, dtype=np.int64)))
            users = grouped.index.to_numpy(np.int64)
            hists = grouped.tolist()
        elif fmt in (DataFormat.T5.value, DataFormat.T6.value):
            users = df["user_id"].to_numpy(np.int64)
            hists = [np.unique(np.asarray(s, dtype=np.int64)) for s in df["item_seq"]]
        else:
            raise NotImplementedError(f"AERecDataset does not support format {fmt}")

        self.cols = {
            "user_id": users,
            "hist": _pad_group(hists, np.int64),
            "hist_len": np.asarray([len(h) for h in hists], np.int32),
        }
        self.n_rows = len(users)
        self.fmt = "aerec-train"

    def get_graph(self):
        """CSR user-item interaction graph (aerecdataset.py:85-117)."""
        import scipy.sparse as ssp
        n_u, n_i = self.config["n_users"], self.config["n_items"]
        if self.fmt != "aerec-train":
            raise ValueError("graph is only available for the training split")
        users = np.repeat(self.cols["user_id"],
                          self.cols["hist_len"].astype(np.int64))
        mask = np.arange(self.cols["hist"].shape[1])[None, :] < self.cols["hist_len"][:, None]
        items = self.cols["hist"][mask]
        data = np.ones(len(users), dtype=np.float64)
        return ssp.csr_matrix((data, (users, items)), shape=(n_u, n_i))


@register_dataset("RankDataset")
class RankDataset(BaseDataset):
    """Folds ``group_size`` consecutive rows into one sample
    (rankdataset.py:25-52). Works for T7 (libFM) and labeled formats."""

    def _normalize(self, df):
        super()._normalize(df)
        g = int(self.config.get("group_size", -1))
        if g <= 1:
            return
        n = (self.n_rows // g) * g
        cols = {}
        for k, v in self.cols.items():
            v = v[:n]
            cols[k] = v.reshape(n // g, g, *v.shape[1:])
        # user_id/session_id are per-group constants
        for k in ("user_id", "session_id"):
            if k in cols:
                cols[k + "_group"] = cols[k]
                cols[k] = cols[k][:, 0]
        self.cols = cols
        self.n_rows = n // g
        self.grouped = True


class InferDataset:
    """Plain id list for embedding inference / top-k serving
    (inferdataset.py:9-67)."""

    def __init__(self, config, data_ids: np.ndarray, user_history=None,
                 is_seqrec: bool = True):
        self.config = config
        self.ids = np.asarray(data_ids, dtype=np.int64)
        self.history = user_history
        self.is_seqrec = is_seqrec
        self.node_type = config.get("node_type", "user")
        self.last_item = int(config.get("last_item", 0))

    def __len__(self):
        return len(self.ids)
