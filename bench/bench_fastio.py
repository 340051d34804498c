"""Native vs pandas text-table parse throughput (host data path).

Generates a user_history-shaped table (int-list column) and a libFM-shaped
table (int-list + float-list) and times both loaders. CPU-only.

Run: python bench/bench_fastio.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirec_tpu.utils import file_io  # noqa: E402
from unirec_tpu.utils.fastio import load_txt_table_native  # noqa: E402

ROWS = 200_000


def gen_history(path, rng):
    with open(path, "w") as f:
        f.write("user_id\titem_seq\n")
        for i in range(ROWS):
            n = rng.integers(5, 60)
            f.write(f"{i+1}\t" + ",".join(map(str, rng.integers(1, 10**6, n)))
                    + "\n")


def gen_libfm(path, rng):
    with open(path, "w") as f:
        f.write("label\tindex_list\tvalue_list\n")
        for _ in range(ROWS):
            n = rng.integers(3, 20)
            idx = " ".join(map(str, rng.integers(0, 10**6, n)))
            val = " ".join(f"{v:.4f}" for v in rng.random(n))
            f.write(f"{rng.integers(0, 2)}\t{idx}\t{val}\n")


def time_loader(fn, path, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(path)
        best = min(best, time.perf_counter() - t0)
    return best, df


def pandas_load(path):
    import pandas as pd
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = pd.read_csv(path, sep=sep)
    for col in df.columns:
        if col in file_io._LIST_INT_COLS:
            df[col] = df[col].apply(lambda c: file_io._parse_list(c, np.int64))
        elif col in file_io._LIST_FLOAT_COLS:
            df[col] = df[col].apply(lambda c: file_io._parse_list(c, np.float32))
    return df


def main():
    import tempfile
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp(prefix="fastio_bench")
    for name, gen in [("history.tsv", gen_history), ("libfm.tsv", gen_libfm)]:
        path = os.path.join(d, name)
        gen(path, rng)
        mb = os.path.getsize(path) / 1e6
        from unirec_tpu.utils.fastio import load_txt_table_packed
        t_packed, pk = time_loader(
            lambda p: load_txt_table_packed(
                p, file_io._LIST_INT_COLS, file_io._LIST_FLOAT_COLS), path)
        t_native, df_n = time_loader(
            lambda p: load_txt_table_native(
                p, file_io._LIST_INT_COLS, file_io._LIST_FLOAT_COLS), path)
        t_pandas, df_p = time_loader(pandas_load, path)
        assert pk is not None and df_n is not None
        assert pk["n_rows"] == len(df_n) == len(df_p) == ROWS
        print(f"{name}: {mb:.1f} MB\n"
              f"  packed     {t_packed*1e3:6.0f} ms ({mb/t_packed:6.0f} MB/s)"
              f"  <- what datasets/UserHistory consume\n"
              f"  dataframe  {t_native*1e3:6.0f} ms ({mb/t_native:6.0f} MB/s)"
              f"  (native parse + object-array rebuild)\n"
              f"  pandas     {t_pandas*1e3:6.0f} ms ({mb/t_pandas:6.1f} MB/s)"
              f"  speedup packed {t_pandas/t_packed:.1f}x, "
              f"df {t_pandas/t_native:.1f}x")


if __name__ == "__main__":
    main()
