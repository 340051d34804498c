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
