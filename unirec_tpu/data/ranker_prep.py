"""AdaRanker dataset builder + item2vec pretraining.

Role parity with the reference's ranker converter
(examples/preprocess/specific_datasets/ranker.py:384-613):

- ``distribution_mixer_sample``: Ada-Ranker's negative sampler — mix the
  positive item's category with 0-2 random categories, split the negative
  budget multinomially across them, and per request draw either from the
  popularity-weighted (item multiplicity) or uniform (deduped) item list of
  each category, rejecting the target / history / duplicates
  (ranker.py:384-411 semantics, vectorized numpy instead of per-item
  random.sample retry loops).
- ``build_adaranker_dataset``: dedup per-user sequences, leave-one-out
  split, emit T4 grouped rows (1 positive + n_neg mixed-distribution
  negatives, one group per category of the positive) as both pandas pkl
  (our pipeline format) and the reference's text layout (ranker.py:454-556).
- ``pretrain_item2vec``: skip-gram-with-negative-sampling item embeddings
  from user histories — the role of the reference's gensim Word2Vec
  pretrain (ranker.py:586-613; gensim is not in this image) — as one jitted
  SGD loop on device; writes the same ``item_emb_<d>.txt`` format consumed
  by ``item_emb_path``/``use_pre_item_emb``.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- neg sampling
def distribution_mixer_sample(rng: np.random.Generator, pos_cate: int,
                              target: int, n_cates: int,
                              cate2items_pop: Dict[int, np.ndarray],
                              cate2items_uni: Dict[int, np.ndarray],
                              n_neg: int, exclude: Sequence[int]) -> List[int]:
    """One request's mixed-distribution negatives (ranker.py:384-411)."""
    cates = [pos_cate] + list(rng.choice(np.arange(1, n_cates + 1),
                                         size=rng.integers(0, 3),
                                         replace=True))
    counts = rng.multinomial(n_neg, np.ones(len(cates)) / len(cates))
    use_uniform = rng.integers(0, 100) < 50  # one coin per request (ref :394)
    banned = set(int(x) for x in exclude)
    banned.add(int(target))
    out: List[int] = []
    for cate, cnt in zip(cates, counts):
        if cnt == 0:
            continue
        pool = (cate2items_uni if use_uniform else cate2items_pop).get(
            int(cate))
        if pool is None or len(pool) == 0:
            continue
        # oversample + reject (replaces the reference's 100-retry loop)
        cand = rng.choice(pool, size=max(4 * cnt, 16), replace=True)
        picked = []
        for c in cand:
            c = int(c)
            if c not in banned and c not in picked:
                picked.append(c)
                if len(picked) == cnt:
                    break
        if len(picked) < cnt:  # fall back to the deduped complement
            rest = [int(x) for x in np.unique(pool)
                    if int(x) not in banned and int(x) not in picked]
            rng.shuffle(rest)
            picked += rest[: cnt - len(picked)]
        out += picked
        banned.update(picked)  # no duplicates across category draws
    return out


# ------------------------------------------------------------ dataset build
def build_adaranker_dataset(infile: str, item2cate_file: str, outdir: str,
                            n_neg_k: int = 5, seed: int = 2022,
                            last_train_window: int = 10) -> Dict[str, int]:
    """'user item item ...' lines + item->categories json → T4 grouped
    splits with distribution-mixer negatives (ranker.py:454-556)."""
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    item2cate_raw = json.load(open(item2cate_file))

    users: List[int] = []
    hists: List[List[int]] = []
    with open(infile) as f:
        for line in f:
            w = line.split()
            if len(w) < 4:  # needs >= 3 items after dedup (ref :480)
                continue
            items = list(dict.fromkeys(int(x) for x in w[1:]))
            if len(items) < 3:
                continue
            users.append(int(w[0]))
            hists.append(items)

    all_items = sorted({i for h in hists for i in h})
    item2tid = {it: t for t, it in enumerate(all_items, start=1)}
    item2cate = {item2tid[i]: [int(c) for c in item2cate_raw.get(str(i), [0])]
                 for i in all_items}
    user2uid = {u: k for k, u in enumerate(sorted(set(users)), start=1)}

    cate2items_pop: Dict[int, list] = {}
    for h in hists:
        for i in h:
            for c in item2cate[item2tid[i]]:
                cate2items_pop.setdefault(c, []).append(item2tid[i])
    cate2items_pop = {c: np.asarray(v) for c, v in cate2items_pop.items()}
    cate2items_uni = {c: np.unique(v) for c, v in cate2items_pop.items()}
    n_cates = max(cate2items_pop) if cate2items_pop else 1

    rows = {"train": [], "valid": [], "test": []}
    hist_rows = []
    for u, h in zip(users, hists):
        uid = user2uid[u]
        tids = [item2tid[i] for i in h]
        hist_rows.append((uid, np.asarray(tids, np.int64)))
        st = max(len(tids) - 2 - last_train_window, 0)

        def emit(split, pos, hist_prefix):
            for cate in item2cate[pos]:
                negs = distribution_mixer_sample(
                    rng, cate, pos, n_cates, cate2items_pop, cate2items_uni,
                    n_neg_k, hist_prefix)
                negs = (negs + [0] * n_neg_k)[:n_neg_k]
                rows[split].append((uid,
                                    np.asarray([pos] + negs, np.int64),
                                    np.asarray([1.0] + [0.0] * n_neg_k,
                                               np.float32)))

        for j, pos in enumerate(tids[:-2]):
            if j >= st:
                emit("train", pos, tids[:j])
        emit("valid", tids[-2], tids[:-2])
        emit("test", tids[-1], tids[:-1])

    import pandas as pd
    for split, data in rows.items():
        df = pd.DataFrame(data, columns=["user_id", "item_id_list",
                                         "label_list"])
        df.to_pickle(os.path.join(outdir, f"{split}.pkl"))
        with open(os.path.join(outdir, f"{split}.txt"), "w") as f:
            for uid, items, labels in data:
                f.write(f"{uid} {','.join(map(str, items))} "
                        f"{','.join(str(int(x)) for x in labels)}\n")
    pd.DataFrame(hist_rows, columns=["user_id", "item_seq"]).to_pickle(
        os.path.join(outdir, "user_history.pkl"))
    with open(os.path.join(outdir, "user_history.txt"), "w") as f:
        for uid, tids in hist_rows:
            f.write(f"{uid} {','.join(map(str, tids))}\n")

    info = {"n_users": len(user2uid) + 1, "n_items": len(item2tid) + 1,
            "n_cates": n_cates,
            "train_file_format": "user-item_group-label_group",
            "valid_file_format": "user-item_group-label_group",
            "test_file_format": "user-item_group-label_group",
            "user_history_file_format": "user-item_seq"}
    with open(os.path.join(outdir, "data.info"), "w") as f:
        json.dump(info, f)
    return info


# ------------------------------------------------------------- item2vec
def pretrain_item2vec(histories: Sequence[np.ndarray], n_items: int,
                      dim: int = 64, window: int = 10, n_neg: int = 5,
                      epochs: int = 3, lr: float = 0.025,
                      batch_size: int = 4096, seed: int = 0,
                      out_path: Optional[str] = None) -> np.ndarray:
    """Skip-gram with negative sampling on item co-occurrence — device SGD
    replacing the reference's gensim Word2Vec (ranker.py:586-613).
    Returns [n_items, dim] (row 0 = padding) and optionally writes the
    reference's ``item_emb_<dim>.txt`` (id \\t comma-floats)."""
    rng = np.random.default_rng(seed)
    centers, contexts = [], []
    for h in histories:
        h = np.asarray(h, np.int64)
        for i in range(len(h)):
            lo, hi = max(0, i - window), min(len(h), i + window + 1)
            for j in range(lo, hi):
                if j != i and h[i] > 0 and h[j] > 0:
                    centers.append(h[i])
                    contexts.append(h[j])
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)
    if len(centers) == 0:
        table = np.zeros((n_items, dim), np.float32)
        if out_path:
            _write_emb(out_path, table)
        return table

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    W_in = 0.1 * np.asarray(jax.random.normal(k1, (n_items, dim)), np.float32)
    # small random output vectors: a zero W_out stalls W_in's gradient for
    # the first steps (dL/dW_in flows through W_out rows)
    W_out = 0.01 * np.asarray(jax.random.normal(k2, (n_items, dim)), np.float32)
    params = (jnp.asarray(W_in), jnp.asarray(W_out))

    @jax.jit
    def step(params, c, ctx, neg, lr):
        def loss_fn(p):
            win, wout = p
            vc = win[c]                                   # [B, D]
            pos = jnp.einsum("bd,bd->b", vc, wout[ctx])
            neg_s = jnp.einsum("bd,bkd->bk", vc, wout[neg])
            return -(jax.nn.log_sigmoid(pos).mean()
                     + jax.nn.log_sigmoid(-neg_s).sum(-1).mean())
        loss, g = jax.value_and_grad(loss_fn)(params)
        return tuple(p - lr * gi for p, gi in zip(params, g)), loss

    n = len(centers)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            neg = rng.integers(1, n_items, size=(batch_size, n_neg))
            params, _ = step(params, jnp.asarray(centers[idx]),
                             jnp.asarray(contexts[idx]),
                             jnp.asarray(neg, jnp.int32), lr)
    table = np.array(params[0])
    table[0] = 0.0
    if out_path:
        _write_emb(out_path, table)
    return table


def _write_emb(path: str, table: np.ndarray):
    with open(path, "w") as f:
        for i in range(1, table.shape[0]):
            f.write(f"{i}\t" + ",".join(f"{x:.6f}" for x in table[i]) + "\n")
