"""Dataset converter logic (data/downloaders.py) on synthetic raw files —
the download step itself is network-gated (this environment has no egress),
but every transformation (k-core, leave-one-out, id remapping, artifact
writing) runs and is checked here against the reference script's semantics
(examples/preprocess/download_split_ml100k.py)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from unirec_tpu.data import downloaders as DL


def _fake_ml100k(tmp_path, n_users=60, n_items=40, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(1, n_users + 1):
        n = rng.integers(15, 30)
        items = rng.choice(np.arange(1, n_items + 1), size=n, replace=False)
        t0 = rng.integers(1, 1000)
        for j, it in enumerate(items):
            rows.append((u, it, rng.integers(1, 6), t0 + j))
    udata = tmp_path / "u.data"
    pd.DataFrame(rows).to_csv(udata, sep="\t", header=False, index=False)
    # u.item: id|name|date|nan|url|19 genre flags
    uitem = tmp_path / "u.item"
    with open(uitem, "w", encoding="ISO-8859-1") as f:
        for i in range(1, n_items + 1):
            flags = rng.integers(0, 2, size=19)
            f.write(f"{i}|movie{i}|01-Jan-1995||http://x|" +
                    "|".join(map(str, flags)) + "\n")
    return str(udata), str(uitem)


def test_kcore_caps_iterations_and_filters():
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2, 3],
                       "item_id": [1, 2, 3, 1, 2, 9]})
    out = DL.k_core_filter(df, user_k=2, item_k=2)
    assert set(out["user_id"]) == {1, 2}
    assert set(out["item_id"]) == {1, 2}


def test_leave_one_out_takes_last_row_per_user():
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2],
                       "item_id": [10, 11, 12, 20, 21]})
    train, test = DL.leave_one_out_split(df)
    assert test["item_id"].tolist() == [12, 21]
    assert train["item_id"].tolist() == [10, 11, 20]


def test_convert_ml100k_artifacts(tmp_path):
    udata, uitem = _fake_ml100k(tmp_path)
    out = str(tmp_path / "out")
    info = DL.convert_ml100k(udata, uitem, out, need_max_len=True,
                             min_rating=3, user_k=5, item_k=5)
    for fname in ("train.csv", "valid.csv", "test.csv", "user_history.csv",
                  "full_user_history.csv", "map.json", "item2cate.json",
                  "item_meta_morec.csv"):
        assert os.path.exists(os.path.join(out, fname)), fname

    train = pd.read_csv(os.path.join(out, "train.csv"), sep="\t")
    valid = pd.read_csv(os.path.join(out, "valid.csv"), sep="\t")
    test = pd.read_csv(os.path.join(out, "test.csv"), sep="\t")
    assert list(train.columns) == ["user_id", "item_id", "max_len"]
    # ids are 1-based contiguous
    all_items = pd.concat([train, valid, test])["item_id"]
    assert all_items.min() >= 1 and all_items.max() < info["n_items"]
    # exactly one valid + one test row per user
    assert (valid.groupby("user_id").size() == 1).all()
    assert (test.groupby("user_id").size() == 1).all()
    # user_history = train rows only, in order
    hist = pd.read_csv(os.path.join(out, "user_history.csv"), sep="\t")
    u0 = int(train["user_id"].iloc[0])
    seq = [int(x) for x in
           hist.loc[hist.user_id == u0, "item_seq"].iloc[0].split(",")]
    train_u0 = train.loc[train.user_id == u0, "item_id"].tolist()
    valid_u0 = valid.loc[valid.user_id == u0, "item_id"].tolist()
    assert seq == train_u0 + valid_u0  # history excludes only the test item
    # max_len is the 0-based position within the user's stream
    assert train.loc[train.user_id == u0, "max_len"].tolist() == \
        list(range(len(train_u0)))
    # morec meta covers every item incl. padding row 0
    meta = pd.read_csv(os.path.join(out, "item_meta_morec.csv"))
    assert len(meta) == info["n_items"] and meta["weight"].iloc[0] == 0.0
    maps = json.load(open(os.path.join(out, "map.json")))
    assert set(maps) == {"user_id", "item_id", "cate"}


def test_convert_ml100k_chains_into_prepare_data(tmp_path):
    """Downloader output feeds the generic raw-csv converter end-to-end."""
    udata, uitem = _fake_ml100k(tmp_path, seed=1)
    out = str(tmp_path / "out2")
    DL.convert_ml100k(udata, uitem, out, user_k=5, item_k=5)
    from unirec_tpu.data.prepare import convert_splits
    ds = str(tmp_path / "ds")
    info = convert_splits(out, ds)
    assert os.path.exists(os.path.join(ds, "train.pkl"))
    assert info["n_users"] > 1 and info["n_items"] > 1
    hist = pd.read_pickle(os.path.join(ds, "user_history.pkl"))
    assert isinstance(hist["item_seq"].iloc[0], np.ndarray)


def test_convert_fmlp(tmp_path):
    infile = tmp_path / "raw.txt"
    infile.write_text("7 1 2 2 3 4\n9 5 6 7 8\n")
    out = str(tmp_path / "fmlp")
    info = DL.convert_fmlp(str(infile), out)
    assert info == {"users": 2, "max_len": 4, "min_len": 4}
    assert open(os.path.join(out, "train.txt")).read().splitlines() == \
        ["7 1,2", "9 5,6"]
    assert open(os.path.join(out, "test.txt")).read().splitlines() == \
        ["7 4", "9 8"]


def test_download_gated_without_network(tmp_path):
    with pytest.raises(RuntimeError, match="egress"):
        DL.download_file("https://files.grouplens.org/nonexistent.zip",
                         str(tmp_path), timeout=5)
