"""Batch user/item embedding inference CLI.

TPU-native counterpart of the reference unirec/main/infer_embedding.py:22-159:
load a checkpoint (model class + params reconstructed from the embedded
config), encode every requested user or item id with one jitted program, and
write ``id\\tv1,v2,...`` text. The Accelerate gather loop becomes a single
device sweep over fixed-shape batches.
"""
from __future__ import annotations

import os
import sys
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from unirec_tpu import config as config_mod
from unirec_tpu.data.history import UserHistory
from unirec_tpu.utils import file_io
from unirec_tpu.utils.checkpoint import load_model_freely
from unirec_tpu.utils.logger import setup_logger


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    if len(arr) == size:
        return arr
    pad = np.repeat(arr[-1:], size - len(arr), axis=0)
    return np.concatenate([arr, pad], axis=0)


def iter_infer_batches(config, ids: np.ndarray, history: Optional[UserHistory],
                       is_seqrec: bool, features: Optional[np.ndarray] = None,
                       node_type: str = "user"):
    """Fixed-shape id batches with optional history windows
    (inferdataset.py:9-67)."""
    bs = int(config.get("test_batch_size") or config.get("batch_size", 512))
    L = int(config.get("max_seq_len", 10))
    last_item = int(config.get("last_item", 0))
    for start in range(0, len(ids), bs):
        chunk = ids[start:start + bs]
        n_real = len(chunk)
        chunk = _pad_to(chunk, bs)
        batch: Dict[str, np.ndarray] = {"n_real": n_real}
        if node_type == "user":
            batch["user_id"] = chunk.astype(np.int32)
            if is_seqrec and history is not None:
                seq, seq_len = history.window(chunk, L, drop_last=last_item)
                batch["item_seq"] = seq
                batch["item_seq_len"] = seq_len
                if features is not None:
                    batch["item_seq_features"] = features[seq]
        else:
            batch["item_id"] = chunk.astype(np.int32)
            if features is not None:
                batch["item_features"] = features[chunk]
        yield batch


def infer_embedding(config, model, params, constants, ids, history,
                    is_seqrec, features) -> Tuple[np.ndarray, np.ndarray]:
    node_type = config.get("node_type", "user")

    def variables(p):
        v = {"params": p}
        if constants:
            v["constants"] = constants
        return v

    traceable = hasattr(model, "init")

    def user_fn(p, batch):
        return model.apply(variables(p), batch, method="user_emb")

    def item_fn(p, batch):
        return model.apply(variables(p), batch["item_id"],
                           batch.get("item_features"), method="item_emb")

    fn = user_fn if node_type == "user" else item_fn
    if traceable:
        fn = jax.jit(fn)

    # dispatch-only sweep (docs/performance_notes.md): queue every batch's
    # embedding program, fetch once at the end — no per-batch round-trip
    pending, reals, out_ids = [], [], []
    for batch in iter_infer_batches(config, ids, history, is_seqrec,
                                    features, node_type):
        n_real = batch.pop("n_real")
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        pending.append(fn(params, jb))
        reals.append(n_real)
        key = "user_id" if node_type == "user" else "item_id"
        out_ids.append(batch[key][:n_real])
    out = [np.asarray(e)[:n] for e, n in zip(jax.device_get(pending), reals)]
    return np.concatenate(out_ids), np.vstack(out)


def run(args: Optional[Dict] = None) -> Tuple[np.ndarray, np.ndarray]:
    config = dict(args or {})
    config.setdefault("exp_name", "infer_embedding")
    out_file = config.get("output_emb_file", "infer_emb.tsv")
    logger = setup_logger(config["exp_name"],
                          os.path.dirname(os.path.abspath(out_file)))

    model, params, constants, ckpt_cfg = load_model_freely(config["model_file"])
    merged = dict(ckpt_cfg)
    merged.update(config)
    config = merged

    node_type = config.get("node_type", "user")
    dpath = config["dataset_path"]
    if config.get("id_file_name"):
        ids = np.loadtxt(os.path.join(dpath, config["id_file_name"]),
                         dtype=np.int64).reshape(-1)
    else:
        n = config["n_users"] if node_type == "user" else config["n_items"]
        ids = np.arange(int(n), dtype=np.int64)
    logger.info("#. %ss for inference: %d", node_type, len(ids))

    history = None
    is_seqrec = bool(getattr(model, "is_seqrec", False)) and node_type == "user"
    if node_type == "user":
        fname = config.get("user_history_filename", "user_history")
        fmt = config.get("user_history_file_format",
                         config.get("train_file_format"))
        history = UserHistory.load(os.path.join(dpath, fname),
                                   int(config["n_users"]), fmt)

    features = None
    if config.get("use_features") and config.get("features_filepath"):
        import ast
        shape = config.get("features_shape", [])
        if isinstance(shape, str):
            shape = ast.literal_eval(shape)
        features = file_io.load_features(config["features_filepath"],
                                         int(config["n_items"]), len(shape))

    ids, emb = infer_embedding(config, model, params, constants, ids, history,
                               is_seqrec, features)
    logger.info("saving inferred embeddings to %s", out_file)
    with open(out_file, "w") as f:
        for i, e in zip(ids, emb):
            f.write(f"{int(i)}\t" + ",".join(str(float(x)) for x in e) + "\n")
    return ids, emb


if __name__ == "__main__":
    run(config_mod.parse_cmd_arguments(sys.argv[1:]))
