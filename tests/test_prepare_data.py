"""Preprocessing CLI test (mirrors the reference's
tests/test_dataset/test_preprocess.py strategy: convert a raw log and assert
on produced files + data.info, then train a model on the output)."""
import copy
import os

import numpy as np
import pandas as pd

from tests.synth import BASE_CONF
from unirec_tpu.data.prepare import prepare_data
from unirec_tpu.main import main


def _raw_log(path, n_users=60, n_items=80, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        for t in range(rng.integers(5, 15)):
            rows.append((f"u{u}", f"i{rng.integers(0, n_items)}", t))
    pd.DataFrame(rows, columns=["user_id", "item_id", "ts"]).to_csv(
        path, sep="\t", index=False)


def test_prepare_and_train(tmp_path):
    raw = os.path.join(str(tmp_path), "raw.tsv")
    out = os.path.join(str(tmp_path), "data")
    _raw_log(raw)
    info = prepare_data(raw, out, time_col="ts", n_neg_k=4)
    for f in ("train.pkl", "valid.pkl", "test.pkl", "user_history.pkl",
              "valid_k.pkl", "test_k.pkl", "data.info"):
        assert os.path.exists(os.path.join(out, f)), f
    assert info["n_users"] == 61 and info["n_items"] <= 81

    # leave-one-out invariant: one valid + one test row per user
    valid = pd.read_pickle(os.path.join(out, "valid.pkl"))
    test = pd.read_pickle(os.path.join(out, "test.pkl"))
    assert valid["user_id"].is_unique and test["user_id"].is_unique
    t4 = pd.read_pickle(os.path.join(out, "test_k.pkl"))
    assert all(len(r) == 5 for r in t4["item_id_list"])

    # the produced files drive a full training run through data.info
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, dataset="prepared", dataset_path=out,
                output_path=os.path.join(str(tmp_path), "run"), task="train",
                epochs=2, exp_name="prep")
    result = main.run(conf)
    assert result is not None and 0 <= result["hit@5"] <= 1


def test_convert_adjacency_and_train(tmp_path):
    """CF benchmark adjacency splits ("user item item ...", the yelp2018 /
    gowalla layout the reference ingests in run_prepare_data-CF_8_1_1.sh)
    convert to T1 train + T5 valid/test and drive a full MF run."""
    from unirec_tpu.data.prepare import convert_adjacency

    rng = np.random.default_rng(5)
    split_dir = os.path.join(str(tmp_path), "splits")
    os.makedirs(split_dir)
    n_users, n_items = 40, 60
    for fname, lo, hi in (("train.txt", 5, 12), ("val.txt", 1, 3),
                          ("test.txt", 1, 3)):
        with open(os.path.join(split_dir, fname), "w") as f:
            for u in range(n_users):
                items = rng.choice(n_items, size=rng.integers(lo, hi),
                                   replace=False)
                f.write(" ".join([str(u)] + [str(i) for i in items]) + "\n")

    out = os.path.join(str(tmp_path), "data")
    info = convert_adjacency(split_dir, out)
    assert info["n_users"] == n_users + 1  # ids shifted by one (0 = pad)
    assert info["n_items"] <= n_items + 1
    assert info["valid_file_format"] == "user-item_seq"
    train = pd.read_pickle(os.path.join(out, "train.pkl"))
    assert set(train.columns) == {"user_id", "item_id"}
    assert int(train["item_id"].min()) >= 1
    test = pd.read_pickle(os.path.join(out, "test.pkl"))
    assert len(test) == n_users and test["user_id"].is_unique

    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, dataset="cf-adj", dataset_path=out,
                output_path=os.path.join(str(tmp_path), "run"), task="train",
                epochs=2, exp_name="adj")
    result = main.run(conf)
    assert result is not None and 0 <= result["hit@5"] <= 1


def test_convert_adjacency_concatenates_repeated_user_lines(tmp_path):
    """A user id spanning multiple lines (malformed or chunked export) must
    concatenate interactions, not silently keep only the LAST line
    (r4 advisor finding on data/prepare.py::convert_adjacency)."""
    from unirec_tpu.data.prepare import convert_adjacency

    split_dir = os.path.join(str(tmp_path), "splits")
    os.makedirs(split_dir)
    with open(os.path.join(split_dir, "train.txt"), "w") as f:
        f.write("0 1 2 3\n")
        f.write("1 4 5\n")
        f.write("0 6 7\n")   # user 0 again — must merge with the first line
    for fname in ("val.txt", "test.txt"):
        with open(os.path.join(split_dir, fname), "w") as f:
            f.write("0 8\n1 9\n")

    out = os.path.join(str(tmp_path), "data")
    convert_adjacency(split_dir, out)
    train = pd.read_pickle(os.path.join(out, "train.pkl"))
    u0 = sorted(train[train["user_id"] == 1]["item_id"])  # ids shift by 1
    assert u0 == [2, 3, 4, 7, 8], u0
    hist = pd.read_pickle(os.path.join(out, "user_history.pkl"))
    h0 = hist[hist["user_id"] == 1]["item_seq"].iloc[0]
    assert sorted(h0) == [2, 3, 4, 7, 8]
