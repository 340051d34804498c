"""Example serving client for exported StableHLO artifacts.

Role parity with the reference's C#/Java ONNX-runtime clients
(examples/serving/inference_csharp, inference_java): load the exported
artifact directory, read a history file, and produce user embeddings, item
embeddings and (user, candidate) scores — no framework/training code on the
serving path, just `jax.export` deserialization (CPU-portable).

Usage:
    # 1. train and export
    unirec-tpu train --model SASRec --dataset_path DATA --output_path OUT ...
    unirec-tpu export --model_file OUT/checkpoint/EXP.pkl --out_dir ARTIFACT
    # 2. serve
    python examples/serving_client.py ARTIFACT DATA/user_history.pkl 1,2,3
"""
import sys

import numpy as np
import pandas as pd

from unirec_tpu.serving.export import ServingModel


def main(artifact_dir: str, history_file: str, user_ids: str):
    serving = ServingModel(artifact_dir)
    L = serving.manifest["max_seq_len"]
    ids = np.asarray([int(u) for u in user_ids.split(",")], np.int32)

    hist_df = pd.read_pickle(history_file)
    hist = dict(zip(hist_df["user_id"], hist_df["item_seq"]))
    seq = np.zeros((len(ids), L), np.int32)
    seq_len = np.zeros(len(ids), np.int32)
    for i, u in enumerate(ids):
        h = np.asarray(hist.get(int(u), []), np.int64)[-L:]
        seq[i, L - len(h):] = h
        seq_len[i] = len(h)

    user_emb = serving.user_emb(ids, seq, seq_len)
    print(f"user embeddings: {user_emb.shape}")

    candidates = np.tile(np.arange(1, 33, dtype=np.int32), (len(ids), 1))
    scores = serving.score(ids, seq, seq_len, candidates)
    top = candidates[np.arange(len(ids))[:, None],
                     np.argsort(-scores, axis=1)[:, :5]]
    for u, items, s in zip(ids, top, np.sort(scores)[:, ::-1][:, :5]):
        print(f"user {u}: top items {items.tolist()} scores {np.round(s, 3).tolist()}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
