"""Readers/writers for the on-disk formats the reference consumes.

Covers the same surface as unirec/utils/file_io.py: tsv/csv/txt tables with
list-valued columns, pickle'd DataFrames, feather files, ``data.info`` JSON,
pretrained embedding text files, and feature files. Everything is returned as
pandas DataFrames at the IO boundary and converted to packed numpy arrays by
the data layer (no object arrays survive past loading).
"""
from __future__ import annotations

import ast
import json
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

# Columns that hold space/comma separated integer or float lists in text files.
_LIST_INT_COLS = {"item_seq", "time_seq", "item_id_list", "label_list", "index_list"}
_LIST_FLOAT_COLS = {"value_list"}


def _parse_list(cell: Any, dtype) -> np.ndarray:
    if isinstance(cell, np.ndarray):
        return cell.astype(dtype)
    if isinstance(cell, (list, tuple)):
        return np.asarray(cell, dtype=dtype)
    s = str(cell).strip()
    if s.startswith("["):
        return np.asarray(ast.literal_eval(s), dtype=dtype)
    if "," in s:
        return np.fromstring(s, dtype=dtype, sep=",")
    return np.fromstring(s, dtype=dtype, sep=" ")


def load_txt_table(path: str) -> pd.DataFrame:
    """Load a headered tsv/csv table, parsing list columns.

    Tries the native C++ parser first (utils/fastio.py — packed two-pass
    parse, ~2 orders of magnitude over the per-cell Python path on
    list-heavy tables); falls back to pandas + ast for anything the native
    parser doesn't cover (bracket lists, string columns, missing cells).
    Disable with UNIREC_FASTIO=0. Both paths produce identical frames
    (tests/test_fastio.py)."""
    from unirec_tpu.utils.fastio import load_txt_table_native
    native = load_txt_table_native(path, _LIST_INT_COLS, _LIST_FLOAT_COLS)
    if native is not None:
        return native
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = pd.read_csv(path, sep=sep)
    for col in df.columns:
        if col in _LIST_INT_COLS:
            df[col] = df[col].apply(lambda c: _parse_list(c, np.int64))
        elif col in _LIST_FLOAT_COLS:
            df[col] = df[col].apply(lambda c: _parse_list(c, np.float32))
    return df


def load_pkl(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pkl(obj, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_table_packed(path_prefix: str):
    """Packed-array load of a TEXT table (``<prefix>.{tsv,csv,txt}``) via
    the native parser: {"scalars": {col: np[N]}, "lists": {col: (flat,
    lens)}}. Returns None for binary formats (ftr/pkl are already fast) or
    when the native parser declines — callers fall back to load_table."""
    from unirec_tpu.utils.fastio import load_txt_table_packed
    # binary formats keep load_table's first-match-wins precedence
    # (reference basedataset.py:209-231): if <prefix>.ftr/.pkl exists,
    # reading the sibling text file here would silently change the data
    # source whenever the two differ.
    if os.path.exists(path_prefix + ".ftr") or \
            os.path.exists(path_prefix + ".pkl"):
        return None
    for ext in (".tsv", ".csv", ".txt"):
        if os.path.exists(path_prefix + ext):
            return load_txt_table_packed(path_prefix + ext,
                                         _LIST_INT_COLS, _LIST_FLOAT_COLS)
    if os.path.exists(path_prefix) and path_prefix.endswith(
            (".tsv", ".csv", ".txt")):
        return load_txt_table_packed(path_prefix,
                                     _LIST_INT_COLS, _LIST_FLOAT_COLS)
    return None


def load_table(path_prefix: str) -> pd.DataFrame:
    """Load ``<prefix>.{ftr,pkl,tsv,csv,txt}`` — first match wins
    (reference basedataset.py:209-231)."""
    if os.path.exists(path_prefix + ".ftr"):
        return pd.read_feather(path_prefix + ".ftr")
    if os.path.exists(path_prefix + ".pkl"):
        obj = load_pkl(path_prefix + ".pkl")
        if not isinstance(obj, pd.DataFrame):
            obj = pd.DataFrame(obj)
        return obj
    for ext in (".tsv", ".csv", ".txt"):
        if os.path.exists(path_prefix + ext):
            return load_txt_table(path_prefix + ext)
    raise FileNotFoundError(f"no data file found for prefix: {path_prefix}")


def load_data_info(dataset_path: str) -> Dict[str, Any]:
    info_path = os.path.join(dataset_path, "data.info")
    if os.path.exists(info_path):
        with open(info_path) as f:
            return json.load(f)
    return {}


def save_data_info(dataset_path: str, info: Dict[str, Any]):
    os.makedirs(dataset_path, exist_ok=True)
    with open(os.path.join(dataset_path, "data.info"), "w") as f:
        json.dump(info, f, indent=2)


def load_pre_item_emb(path: str) -> np.ndarray:
    """Load pretrained item embeddings: text lines of ``id<TAB>v1,v2,...`` or
    whitespace-separated floats (reference file_io.load_pre_item_emb)."""
    rows: List[np.ndarray] = []
    ids: List[int] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if "\t" in line:
                iid, vec = line.split("\t", 1)
                ids.append(int(iid))
                rows.append(_parse_list(vec, np.float32))
            else:
                rows.append(np.fromstring(line, dtype=np.float32, sep=" "))
    emb = np.stack(rows)
    if ids:
        order = np.argsort(ids)
        emb = emb[order]
    return emb


def load_features(path: str, n_items: int, n_features: int) -> np.ndarray:
    """Item→categorical-features table: returns int32 [n_items, n_features];
    row 0 (padding item) is all zeros (reference file_io.load_features)."""
    res = np.zeros((n_items, n_features), dtype=np.int32)
    df = load_table(os.path.splitext(path)[0]) if not os.path.exists(path) else None
    if df is None:
        if path.endswith((".tsv", ".csv", ".txt")):
            df = load_txt_table(path)
        elif path.endswith(".pkl"):
            df = load_pkl(path)
        elif path.endswith(".ftr"):
            df = pd.read_feather(path)
        else:
            raise ValueError(f"unsupported feature file: {path}")
    feat_col = [c for c in df.columns if c != "item_id"][0]
    for iid, feats in zip(df["item_id"].to_numpy(), df[feat_col]):
        arr = _parse_list(feats, np.int64)[:n_features]
        if 0 <= iid < n_items:
            res[iid, : len(arr)] = arr
    return res


def load_item2info(n_items: int, path: str, info_type: str) -> np.ndarray:
    """item_id→scalar info (price/category); missing ids get 0
    (reference general.load_item2info)."""
    if path.endswith((".csv", ".tsv")):
        df = pd.read_csv(path, header=0, sep=",")
    elif path.endswith(".pkl"):
        df = load_pkl(path)
    elif path.endswith(".ftr"):
        df = pd.read_feather(path)
    else:
        raise ValueError(f"unsupported item info file: {path}")
    mapping = df.set_index("item_id")[info_type].to_dict()
    size = max(n_items, max(mapping.keys()) + 1)
    res = np.zeros(size, dtype=df[info_type].dtype)
    for iid, v in mapping.items():
        res[iid] = v
    return res
