"""Native text-table parser (unirec_tpu/native/fastio.cc via utils/fastio.py) must
produce exactly the frame the pandas path produces, and must decline
(returning None -> pandas fallback) on inputs it does not cover."""
import os

import numpy as np
import pandas as pd
import pytest

from unirec_tpu.utils import file_io
from unirec_tpu.utils.fastio import get_lib, load_txt_table_native

LIC, LFC = file_io._LIST_INT_COLS, file_io._LIST_FLOAT_COLS

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native fastio unavailable (no g++)")


def _pandas_load(path):
    """The pure-pandas reference path (native parser bypassed)."""
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = pd.read_csv(path, sep=sep)
    for col in df.columns:
        if col in LIC:
            df[col] = df[col].apply(lambda c: file_io._parse_list(c, np.int64))
        elif col in LFC:
            df[col] = df[col].apply(lambda c: file_io._parse_list(c, np.float32))
    return df


def _assert_frames_equal(a, b):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        if isinstance(a[c].iloc[0], np.ndarray):
            for x, y in zip(a[c], b[c]):
                np.testing.assert_array_equal(x, y)
                assert x.dtype == y.dtype
        else:
            assert a[c].dtype == b[c].dtype, c
            np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_native_matches_pandas_seq_table(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(200):
        n = rng.integers(1, 12)
        seq = ",".join(str(x) for x in rng.integers(1, 999, n))
        rows.append(f"{i + 1}\t{rng.integers(1, 999)}\t{seq}\t{n}")
    path = os.path.join(str(tmp_path), "t.tsv")
    with open(path, "w") as f:
        f.write("user_id\titem_id\titem_seq\titem_seq_len\n")
        f.write("\n".join(rows) + "\n")
    native = load_txt_table_native(path, LIC, LFC)
    assert native is not None
    _assert_frames_equal(native, _pandas_load(path))


def test_native_matches_pandas_libfm(tmp_path):
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(150):
        n = rng.integers(1, 8)
        idx = " ".join(str(x) for x in rng.integers(0, 5000, n))
        val = " ".join(f"{v:.3f}" for v in rng.random(n))
        rows.append(f"{rng.integers(0, 2)}\t{idx}\t{val}")
    path = os.path.join(str(tmp_path), "fm.tsv")
    with open(path, "w") as f:
        f.write("label\tindex_list\tvalue_list\n")
        f.write("\n".join(rows) + "\n")
    native = load_txt_table_native(path, LIC, LFC)
    assert native is not None
    _assert_frames_equal(native, _pandas_load(path))


def test_native_matches_pandas_float_scalars_and_csv(tmp_path):
    path = os.path.join(str(tmp_path), "t.csv")
    with open(path, "w") as f:
        f.write("user_id,rating,weight\n")
        f.write("1,3.5,1.0\n2,4,0.5\n3,-2e-1,2\n")
    native = load_txt_table_native(path, LIC, LFC)
    assert native is not None
    ref = _pandas_load(path)
    _assert_frames_equal(native, ref)
    assert native["user_id"].dtype == np.int64      # integral -> int64
    assert native["rating"].dtype == np.float64     # mixed -> float


def test_native_declines_string_and_bracket_inputs(tmp_path):
    p1 = os.path.join(str(tmp_path), "s.tsv")
    with open(p1, "w") as f:
        f.write("user_id\tname\n1\talice\n")
    assert load_txt_table_native(p1, LIC, LFC) is None

    p2 = os.path.join(str(tmp_path), "b.tsv")
    with open(p2, "w") as f:
        f.write("user_id\titem_seq\n1\t[1, 2, 3]\n")
    assert load_txt_table_native(p2, LIC, LFC) is None
    # and the public loader still parses it via the ast fallback
    df = file_io.load_txt_table(p2)
    np.testing.assert_array_equal(df["item_seq"].iloc[0], [1, 2, 3])


def test_load_txt_table_uses_native_and_matches(tmp_path):
    path = os.path.join(str(tmp_path), "h.tsv")
    with open(path, "w") as f:
        f.write("user_id\titem_seq\n")
        for i in range(50):
            f.write(f"{i+1}\t{i+1},{i+2},{i+3}\n")
    df = file_io.load_txt_table(path)
    _assert_frames_equal(df, _pandas_load(path))


def test_native_empty_list_cells(tmp_path):
    path = os.path.join(str(tmp_path), "e.tsv")
    with open(path, "w") as f:
        f.write("user_id\titem_seq\n1\t\n2\t7\n")
    native = load_txt_table_native(path, LIC, LFC)
    assert native is not None
    assert len(native["item_seq"].iloc[0]) == 0
    np.testing.assert_array_equal(native["item_seq"].iloc[1], [7])
