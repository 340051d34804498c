"""The packed (native-parser) dataset/history build paths must produce
exactly the same normalized columns as the DataFrame paths."""
import os

import numpy as np
import pytest

from unirec_tpu.data.datasets import BaseDataset
from unirec_tpu.data.history import UserHistory
from unirec_tpu.utils import file_io
from unirec_tpu.utils.fastio import get_lib, pad_packed

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native fastio unavailable (no g++)")


def _write(tmp_path, name, header, rows):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    return p


def _both_paths(config, path, filename):
    """Build BaseDataset twice: packed (native) and DataFrame (forced)."""
    ds_packed = BaseDataset(config, path, filename)
    prefix = os.path.join(path, filename)
    packed = file_io.load_table_packed(prefix)
    assert packed is not None, "native parser declined; test is vacuous"
    ds_df = BaseDataset.__new__(BaseDataset)
    ds_df.config, ds_df.task = config, config.get("data_loader_task", "train")
    ds_df.eval_protocol = config.get("eval_protocol")
    ds_df.fmt = config["data_format"]
    ds_df._normalize(file_io.load_table(prefix))
    return ds_packed, ds_df


def _assert_cols_equal(a, b):
    assert a.fmt == b.fmt
    assert set(a.cols) == set(b.cols)
    for k in a.cols:
        np.testing.assert_array_equal(a.cols[k], b.cols[k])
        assert a.cols[k].dtype == b.cols[k].dtype, k


def test_t5_expand_and_grouped(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for u in range(1, 40):
        seq = ",".join(map(str, rng.integers(1, 99, rng.integers(1, 9))))
        rows.append(f"{u}\t{seq}")
    _write(tmp_path, "seq.tsv", "user_id\titem_seq", rows)
    base = {"data_format": "user-item_seq", "data_loader_task": "train"}
    _assert_cols_equal(*_both_paths(dict(base), str(tmp_path), "seq"))
    base = {"data_format": "user-item_seq", "data_loader_task": "test",
            "eval_protocol": "one_vs_all"}
    _assert_cols_equal(*_both_paths(dict(base), str(tmp_path), "seq"))


def test_t7_libfm(tmp_path):
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(30):
        n = rng.integers(1, 6)
        idx = " ".join(map(str, rng.integers(0, 999, n)))
        val = " ".join(f"{v:.3f}" for v in rng.random(n))
        rows.append(f"{rng.integers(0, 2)}\t{idx}\t{val}")
    _write(tmp_path, "fm.tsv", "label\tindex_list\tvalue_list", rows)
    conf = {"data_format": "label-index_group-value_group",
            "data_loader_task": "train"}
    _assert_cols_equal(*_both_paths(conf, str(tmp_path), "fm"))


def test_t2_scalars_with_label_filter(tmp_path):
    rows = [f"{u}\t{u * 3 % 50 + 1}\t{u % 2}" for u in range(1, 60)]
    _write(tmp_path, "t2.tsv", "user_id\titem_id\tlabel", rows)
    conf = {"data_format": "user-item-label", "data_loader_task": "test",
            "eval_protocol": "one_vs_all"}
    a, b = _both_paths(conf, str(tmp_path), "t2")
    _assert_cols_equal(a, b)
    assert (a.cols["label"] > 0).all()  # filter applied


def test_user_history_load_packed_matches_dataframe(tmp_path):
    rng = np.random.default_rng(2)
    rows = []
    for u in range(1, 50):
        n = rng.integers(1, 15)
        rows.append(f"{u}\t" + ",".join(map(str, rng.integers(1, 99, n))))
    # duplicate user row: later wins (from_dataframe loop semantics)
    rows.append("7\t42,43")
    p = _write(tmp_path, "hist.tsv", "user_id\titem_seq", rows)
    prefix = p[:-4]
    for cap in (-1, 6):
        hp = UserHistory.load(prefix, 60, "user-item_seq", capacity=cap)
        hd = UserHistory.from_dataframe(file_io.load_table(prefix), 60,
                                        "user-item_seq", capacity=cap)
        np.testing.assert_array_equal(hp.items, hd.items)
        np.testing.assert_array_equal(hp.lengths, hd.lengths)


def test_history_packed_dropped_duplicate_does_not_widen(tmp_path):
    """If a DROPPED earlier duplicate row is the longest row in the file,
    from_packed must not widen items/capacity beyond what from_dataframe
    (max over surviving sequences only) produces."""
    rows = ["3\t" + ",".join(map(str, range(1, 31))),   # 30 items, dropped
            "3\t42,43",                                  # later row wins
            "5\t7,8,9"]
    p = _write(tmp_path, "dup.tsv", "user_id\titem_seq", rows)
    prefix = p[:-4]
    hp = UserHistory.load(prefix, 10, "user-item_seq")
    hd = UserHistory.from_dataframe(file_io.load_table(prefix), 10,
                                    "user-item_seq")
    assert hp.capacity == hd.capacity == 3
    np.testing.assert_array_equal(hp.items, hd.items)
    np.testing.assert_array_equal(hp.lengths, hd.lengths)


def test_load_table_packed_defers_to_binary_formats(tmp_path):
    """When <prefix>.ftr or .pkl exists alongside a text file, the packed
    fast path must return None so load_table's first-match-wins precedence
    (reference basedataset.py:209-231) decides the data source."""
    import pandas as pd
    _write(tmp_path, "tbl.tsv", "user_id\titem_id",
           [f"{u}\t{u + 1}" for u in range(1, 9)])
    prefix = os.path.join(str(tmp_path), "tbl")
    assert file_io.load_table_packed(prefix) is not None
    pd.DataFrame({"user_id": [1], "item_id": [99]}).to_feather(
        prefix + ".ftr")
    assert file_io.load_table_packed(prefix) is None
    df = file_io.load_table(prefix)
    assert list(df["item_id"]) == [99]


def test_pad_packed_matches_pad_group():
    from unirec_tpu.data.datasets import _pad_group
    rng = np.random.default_rng(3)
    lens = rng.integers(0, 9, 40).astype(np.int32)
    flat = rng.integers(1, 99, int(lens.sum())).astype(np.int64)
    arrs = np.split(flat, np.cumsum(lens[:-1]))
    for width in (None, 4):
        np.testing.assert_array_equal(
            pad_packed(flat, lens, np.int64, width),
            _pad_group(arrs, np.int64, width))
