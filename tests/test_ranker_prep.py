"""AdaRanker dataset builder + item2vec pretrain (data/ranker_prep.py) —
role parity with the reference's ranker converter
(examples/preprocess/specific_datasets/ranker.py)."""
import json
import os

import numpy as np
import pandas as pd

from unirec_tpu.data import ranker_prep as RP


def _raw(tmp_path, n_users=30, n_items=60, seed=0):
    rng = np.random.default_rng(seed)
    cates = {str(i): [int(rng.integers(1, 5))] for i in range(1, n_items + 1)}
    infile = tmp_path / "seqs.txt"
    with open(infile, "w") as f:
        for u in range(1, n_users + 1):
            items = rng.choice(np.arange(1, n_items + 1),
                               size=rng.integers(6, 15), replace=False)
            f.write(f"{u} " + " ".join(map(str, items)) + "\n")
    catefile = tmp_path / "item2cate.json"
    catefile.write_text(json.dumps(cates))
    return str(infile), str(catefile)


def test_build_adaranker_dataset(tmp_path):
    infile, catefile = _raw(tmp_path)
    out = str(tmp_path / "out")
    info = RP.build_adaranker_dataset(infile, catefile, out, n_neg_k=5,
                                      seed=1)
    for split in ("train", "valid", "test"):
        df = pd.read_pickle(os.path.join(out, f"{split}.pkl"))
        assert len(df) > 0
        g = np.stack(df["item_id_list"].to_numpy())
        lab = np.stack(df["label_list"].to_numpy())
        assert g.shape[1] == 6 and lab.shape[1] == 6
        assert (lab[:, 0] == 1).all() and (lab[:, 1:] == 0).all()
        # negatives never equal the positive
        assert not (g[:, 1:] == g[:, :1]).any()
        assert g.max() < info["n_items"]
    # one valid/test group per category of the held-out item (single-cate
    # synth -> exactly one per user)
    valid = pd.read_pickle(os.path.join(out, "valid.pkl"))
    assert valid.groupby("user_id").size().max() >= 1
    hist = pd.read_pickle(os.path.join(out, "user_history.pkl"))
    assert len(hist) == valid["user_id"].nunique()
    # text twins exist in the reference layout
    line = open(os.path.join(out, "train.txt")).readline().split()
    assert len(line) == 3 and len(line[1].split(",")) == 6


def test_distribution_mixer_rejects_exclusions():
    rng = np.random.default_rng(0)
    pop = {1: np.array([2, 2, 3, 4, 5]), 2: np.array([6, 7, 8])}
    uni = {c: np.unique(v) for c, v in pop.items()}
    for _ in range(20):
        negs = RP.distribution_mixer_sample(rng, 1, target=3, n_cates=2,
                                            cate2items_pop=pop,
                                            cate2items_uni=uni, n_neg=3,
                                            exclude=[4])
        assert 3 not in negs and 4 not in negs
        assert len(negs) == len(set(negs))


def test_pretrain_item2vec_learns_cooccurrence(tmp_path):
    # two disjoint item cliques -> within-clique similarity must beat
    # across-clique after training
    rng = np.random.default_rng(0)
    a, b = np.arange(1, 7), np.arange(7, 13)
    hists = [rng.permutation(a) for _ in range(60)] + \
            [rng.permutation(b) for _ in range(60)]
    out = str(tmp_path / "item_emb_16.txt")
    emb = RP.pretrain_item2vec(hists, n_items=13, dim=16, epochs=40, lr=0.1,
                               batch_size=256, out_path=out)
    def sim(i, j):
        x, y = emb[i], emb[j]
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9))
    within = np.mean([sim(i, j) for i in a for j in a if i != j])
    across = np.mean([sim(i, j) for i in a for j in b])
    assert within > across + 0.2, (within, across)
    lines = open(out).read().splitlines()
    assert len(lines) == 12 and len(lines[0].split("\t")[1].split(",")) == 16


def test_adaranker_pipeline_e2e(tmp_path):
    """Full reference workflow (ada-ranker/run_adaranker_pipeline):
    build the mixer-sampled dataset, pretrain item2vec embeddings, train
    AdaRanker with use_pre_item_emb — all through the public surfaces."""
    import copy

    from tests.synth import BASE_CONF
    from unirec_tpu import cli
    from unirec_tpu.main import main

    infile, catefile = _raw(tmp_path, n_users=60, n_items=80, seed=3)
    out = str(tmp_path / "ds")
    rc = cli.main(["prepare-adaranker", "--infile", infile,
                   "--item2cate_file", catefile, "--out_dir", out,
                   "--n_neg_k", "5", "--pretrain_item_emb", "1",
                   "--embedding_size", "16"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "item_emb_16.txt"))

    info = json.load(open(os.path.join(out, "data.info")))
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="AdaRanker", dataloader="SeqRecDataset",
                train_type="Ada-Ranker", base_model="GRU",
                dataset_path=out, task="train", epochs=3,
                n_sample_neg_train=0, group_size=-1,
                valid_protocol="one_vs_k", test_protocol="one_vs_k",
                metrics="['auc','group_auc']", key_metric="auc",
                embedding_size=16, hidden_size=16, max_seq_len=8,
                use_pre_item_emb=1,
                item_emb_path=os.path.join(out, "item_emb_16.txt"),
                exp_name="ada-prep",
                output_path=str(tmp_path / "run"))
    res = main.run(conf)
    assert 0.0 <= res["auc"] <= 1.0  # pipeline runs end-to-end
