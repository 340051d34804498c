"""Deterministic synthetic recommendation dataset.

The reference test-suite downloads ml-100k (tests/test_dataset/
test_preprocess.py:66-68); this environment has no egress, so golden-metric
tests run on a generated dataset with planted cluster structure: users and
items belong to latent groups and users interact overwhelmingly within their
group, so any working model beats the random baseline by a wide, stable
margin. Leave-one-out split (last item → test, second-to-last → valid)
mirrors the reference preprocessing (examples/preprocess/prepare_data.py:123-125).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

N_USERS = 201          # ids 1..200 (0 is padding)
N_ITEMS = 301          # ids 1..300
N_CLUSTERS = 6
MIN_LEN, MAX_LEN = 12, 40
SEED = 7


def generate(root: str, n_users: int = N_USERS, n_items: int = N_ITEMS,
             text_emb_dim: int = 24) -> dict:
    rng = np.random.default_rng(SEED)
    os.makedirs(root, exist_ok=True)
    item_cluster = rng.integers(0, N_CLUSTERS, size=n_items)
    cluster_items = [np.flatnonzero(item_cluster == c) for c in range(N_CLUSTERS)]
    cluster_items = [c[c > 0] for c in cluster_items]

    seqs = {}
    for u in range(1, n_users):
        c = (u - 1) % N_CLUSTERS
        L = rng.integers(MIN_LEN, MAX_LEN)
        own = cluster_items[c]
        other = np.concatenate([cluster_items[(c + k) % N_CLUSTERS]
                                for k in range(1, N_CLUSTERS)])
        n_own = int(0.85 * L)
        items = np.concatenate([rng.choice(own, size=n_own, replace=True),
                                rng.choice(other, size=L - n_own, replace=True)])
        rng.shuffle(items)
        # dedup consecutive repeats, keep >= MIN_LEN
        seqs[u] = items.astype(np.int64)

    train_rows, valid_rows, test_rows, hist_rows = [], [], [], []
    for u, s in seqs.items():
        train_seq, valid_item, test_item = s[:-2], s[-2], s[-1]
        hist_rows.append((u, train_seq))
        for it in train_seq:
            train_rows.append((u, it))
        valid_rows.append((u, valid_item))
        test_rows.append((u, test_item))

    pd.DataFrame(train_rows, columns=["user_id", "item_id"]).to_pickle(
        os.path.join(root, "train.pkl"))
    pd.DataFrame(valid_rows, columns=["user_id", "item_id"]).to_pickle(
        os.path.join(root, "valid.pkl"))
    pd.DataFrame(test_rows, columns=["user_id", "item_id"]).to_pickle(
        os.path.join(root, "test.pkl"))
    pd.DataFrame({"user_id": list(seqs.keys()),
                  "item_seq": [np.asarray(v[:-2]) for v in seqs.values()]}).to_pickle(
        os.path.join(root, "user_history.pkl"))

    # multi-positive eval file (T5): last 3 train items as positives
    pd.DataFrame({"user_id": list(seqs.keys()),
                  "item_seq": [np.asarray(v[-2:]) for v in seqs.values()]}).to_pickle(
        os.path.join(root, "test_multipos.pkl"))

    # session-format ranking file (T2_1): per user session with 1 pos + 4 neg
    rng2 = np.random.default_rng(SEED + 1)
    sess_rows = []
    for sid, (u, s) in enumerate(seqs.items()):
        pos = s[-1]
        negs = rng2.integers(1, n_items, size=4)
        sess_rows.append((u, pos, 1, sid))
        for ng in negs:
            sess_rows.append((u, ng, 0, sid))
    pd.DataFrame(sess_rows, columns=["user_id", "item_id", "label", "session_id"]) \
        .to_pickle(os.path.join(root, "test_session.pkl"))

    # ------------------------------------------------------------- rank data
    # T4 (user-item_group-label_group): per user a group of 6 candidates,
    # positive first (matches the reference ranker preprocessing,
    # specific_datasets/ranker.py:188-196)
    rng3 = np.random.default_rng(SEED + 2)
    t4 = {"train": [], "valid": [], "test": []}
    for u, s in seqs.items():
        c = (u - 1) % N_CLUSTERS
        other = np.concatenate([cluster_items[(c + k) % N_CLUSTERS]
                                for k in range(1, N_CLUSTERS)])
        for split, pos in (("train", s[:-2]), ("valid", s[-2:-1]), ("test", s[-1:])):
            for p in pos:
                negs = rng3.choice(other, size=5, replace=False)
                t4[split].append((u, np.concatenate([[p], negs]).astype(np.int64),
                                  np.array([1.0, 0, 0, 0, 0, 0], np.float32)))
    for split, rows in t4.items():
        pd.DataFrame(rows, columns=["user_id", "item_id_list", "label_list"]) \
            .to_pickle(os.path.join(root, f"rank_{split}.pkl"))

    # T7 (label-index_group-value_group): libFM-style rows; feature ids are
    # 1+user and 1+n_users+item (0 reserved for padding). Rows come in
    # groups of 6 with the positive first, so group_size=6 folds them.
    n_feats = 1 + n_users + n_items
    t7 = {"train": [], "valid": [], "test": []}
    for split, rows in t4.items():
        for (u, items, labels) in rows:
            for it, lab in zip(items, labels):
                t7[split].append((float(lab),
                                  np.array([1 + u, 1 + n_users + it], np.int64),
                                  np.array([1.0, 1.0], np.float32)))
    for split, rows in t7.items():
        pd.DataFrame(rows, columns=["label", "index_list", "value_list"]) \
            .to_pickle(os.path.join(root, f"libfm_{split}.pkl"))

    # MoRec item meta: price per item, fairness group = item cluster (1-based),
    # alignment group by popularity quintile (reference morec meta format,
    # facility/morec/__init__.py:8-61)
    pop = np.zeros(n_items, np.int64)
    for s in seqs.values():
        np.add.at(pop, s[:-2], 1)
    rank = np.argsort(-pop[1:], kind="stable")
    align = np.zeros(n_items, np.int64)
    for g, bucket in enumerate(np.array_split(rank + 1, 5), start=1):
        align[bucket] = g
    meta = pd.DataFrame({
        "item_id": np.arange(1, n_items),
        "weight": np.round(rng.uniform(1.0, 50.0, size=n_items - 1), 2),
        "fair_group": item_cluster[1:] + 1,
        "align_group": align[1:],
    })
    meta.to_csv(os.path.join(root, "item_meta_morec.csv"), index=False)

    # categorical item features: one field = cluster id (1..N_CLUSTERS)
    feat_rows = [(i, np.asarray([int(item_cluster[i]) + 1], np.int64))
                 for i in range(1, n_items)]
    pd.DataFrame(feat_rows, columns=["item_id", "features"]).to_pickle(
        os.path.join(root, "item_features.pkl"))

    # frozen "text" embeddings correlated with clusters
    centers = rng.normal(size=(N_CLUSTERS, text_emb_dim))
    text = centers[item_cluster] + 0.1 * rng.normal(size=(n_items, text_emb_dim))
    with open(os.path.join(root, "text_emb.tsv"), "w") as f:
        for i in range(1, n_items):
            f.write(f"{i}\t" + ",".join(f"{x:.5f}" for x in text[i]) + "\n")

    info = {"n_users": n_users, "n_items": n_items, "n_feats": n_feats,
            "train_file_format": "user-item",
            "valid_file_format": "user-item",
            "test_file_format": "user-item",
            "user_history_file_format": "user-item_seq"}
    with open(os.path.join(root, "data.info"), "w") as f:
        json.dump(info, f)
    return info


def gen_ml100k_shaped(out_dir: str, seed: int = 7, n_users: int = 943,
                      n_items: int = 1682, n_ratings: int = 100_000) -> None:
    """Write a synthetic RAW dataset with ml-100k's shape and marginals:
    ``u.data`` (user \\t item \\t rating \\t timestamp) and ``u.item``
    (pipe-separated, 19 genre flags) at 943 users x 1682 items x ~100k
    ratings, zipf item popularity, lognormal per-user activity with the
    ml-100k >=20-ratings-per-user guarantee, and the real rating marginal
    (~{1:6, 2:11, 3:27, 4:34, 5:22}%).

    Purpose: a full-scale dress rehearsal of the golden ml-100k run
    (reference tests/test_model/test_seq_model.py:21-75) in environments
    with no network egress — everything (preprocessing, configs, epochs,
    seeds) is identical to test_golden_ml100k.py except the ratings
    themselves are synthetic.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    pop = 1.0 / np.arange(1, n_items + 1) ** 0.9
    pop = rng.permutation(pop)
    pop /= pop.sum()
    counts = np.minimum(
        np.maximum(rng.lognormal(3.8, 0.9, n_users), 20), 700).astype(int)
    counts = np.maximum(
        (counts * (n_ratings / counts.sum())).astype(int), 20)
    rating_p = np.array([0.06, 0.11, 0.27, 0.34, 0.22])
    rating_p /= rating_p.sum()
    rows = []
    t0 = 874_000_000  # ml-100k's epoch range (1997)
    for u in range(1, n_users + 1):
        k = counts[u - 1]
        items = rng.choice(n_items, size=min(k * 2, n_items), replace=False,
                           p=pop)[:k] + 1
        ts = np.sort(rng.integers(0, 20_000_000, len(items))) + t0
        r = rng.choice([1, 2, 3, 4, 5], size=len(items), p=rating_p)
        rows.append(np.stack([np.full(len(items), u), items, r, ts], axis=1))
    df = pd.DataFrame(np.concatenate(rows),
                      columns=["user_id", "item_id", "rating", "timestamp"])
    df.to_csv(os.path.join(out_dir, "u.data"), sep="\t", header=False,
              index=False)
    with open(os.path.join(out_dir, "u.item"), "w",
              encoding="ISO-8859-1") as f:
        for i in range(1, n_items + 1):
            g = np.zeros(19, int)
            g[rng.integers(0, 19, rng.integers(1, 4))] = 1
            f.write(f"{i}|title{i}|01-Jan-1995||url{i}|"
                    + "|".join(map(str, g)) + "\n")


BASE_CONF = {
    "dataset": "synth",
    "exp_name": "pytest",
    "learning_rate": 0.002,
    "dropout_prob": 0.0,
    "embedding_size": 32,
    "hidden_size": 32,
    "loss_type": "bce",
    "max_seq_len": 10,
    "has_user_bias": 0,
    "has_item_bias": 0,
    "epochs": 3,
    "early_stop": -1,
    "batch_size": 256,
    "n_sample_neg_train": 9,
    "valid_protocol": "one_vs_all",
    "test_protocol": "one_vs_all",
    "history_mask_mode": "autoregressive",
    "user_history_filename": "user_history",
    "metrics": "['hit@5;10', 'ndcg@5;10']",
    "key_metric": "ndcg@5",
    "verbose": 1,
    "shuffle_train": 1,
    "seed": 2022,
}
