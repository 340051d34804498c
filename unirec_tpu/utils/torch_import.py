"""Import reference (UniRec torch) checkpoints into unirec_tpu param trees.

Migration path for users switching frameworks: a ``.pth`` checkpoint saved
by the reference trainer (trainer.py:389-398, dict with ``state_dict``)
converts into our flax parameter pytree. Name mapping:

    a.b.weight (Linear [out, in])  -> a/b/kernel (transposed to [in, out])
    a.b.bias                       -> a/b/bias
    *embedding*.weight             -> .../embedding (no transpose)
    LayerNorm.weight / .bias       -> .../scale, .../bias
    trm_encoder.layer.<i>.*        -> trm_encoder/layer_<i>/*

Covered models: every architecture whose modules map 1:1 (MF, SASRec, GRU,
BST, AvgHist/AttHist/SVD++, FM). Unknown keys are returned for the caller
to inspect rather than silently dropped.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _is_embedding(path: List[str]) -> bool:
    return any("embedding" in p for p in path)


def convert_state_dict(state_dict: Dict[str, Any]
                       ) -> Tuple[Dict[str, Any], List[str]]:
    """torch state_dict → (flax-style nested dict, unconverted key list)."""
    tree: Dict[str, Any] = {}
    leftovers: List[str] = []
    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        # torch ModuleList: layer.0.x → layer_0/x (reference TransformerEncoder)
        merged: List[str] = []
        for p in parts:
            if p.isdigit() and merged:
                merged[-1] = f"{merged[-1]}_{p}"
            else:
                merged.append(p)
        *path, leaf = merged
        parent_is_ln = bool(path) and path[-1].startswith("LayerNorm")
        if not path and leaf.startswith("LayerNorm"):
            # top-level LayerNorm.weight arrives as leaf='LayerNorm', but
            # split gives path=['LayerNorm'], handled above
            pass
        if leaf == "weight":
            if parent_is_ln:
                leaf = "scale"
            elif _is_embedding(path):
                leaf = "embedding"
            elif arr.ndim == 2:
                leaf = "kernel"
                arr = arr.T
            else:
                leaf = "kernel"
        elif leaf == "bias":
            pass
        else:
            leftovers.append(key)
            continue
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return tree, leftovers


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(converted params, reference config) from a UniRec ``.pth`` file."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params, leftovers = convert_state_dict(ckpt["state_dict"])
    cfg = ckpt.get("config", {})
    if leftovers:
        import logging
        logging.getLogger(__name__).warning(
            "unconverted checkpoint keys: %s", leftovers)
    return params, cfg
