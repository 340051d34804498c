"""Layered configuration system.

Merge order (lowest → highest priority), matching the reference's semantics
(unirec/utils/argument_parser.py:214-241, documented at main.py:440-442):

    base.yaml → config/model/<Model>.yaml → config/dataset/<dataset>.yaml
    → optional --config_file → command-line args → caller-provided dict

Dataset yamls may live either in this package's ``dataset/`` dir or next to
the data (``<dataset_path>/<dataset>.yaml`` or ``data.info`` JSON produced by
preprocessing).
"""
from __future__ import annotations

import argparse
import ast
import json
import os
from typing import Any, Dict, Iterable, Optional

import yaml

_CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return data or {}


def _coerce(value: str) -> Any:
    """Best-effort typed parse of a CLI string value."""
    if not isinstance(value, str):
        return value
    low = value.strip()
    if low.lower() in ("true", "false"):
        return low.lower() == "true"
    try:
        return ast.literal_eval(low)
    except (ValueError, SyntaxError):
        return value


def parse_cmd_arguments(argv: Optional[Iterable[str]] = None) -> Dict[str, Any]:
    """Parse ``--key value`` style args into a typed dict (unknown keys allowed)."""
    parser = argparse.ArgumentParser(add_help=False)
    known, unknown = parser.parse_known_args(list(argv) if argv is not None else None)
    res: Dict[str, Any] = {}
    key = None
    for tok in unknown:
        if tok.startswith("--"):
            if "=" in tok:
                k, v = tok[2:].split("=", 1)
                res[k] = _coerce(v)
                key = None
            else:
                key = tok[2:]
                res[key] = True  # bare flag
        elif key is not None:
            res[key] = _coerce(tok)
            key = None
    return res


def load_dataset_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Locate dataset metadata: packaged yaml, sidecar yaml, or data.info JSON."""
    name = config.get("dataset")
    res: Dict[str, Any] = {}
    if name:
        packaged = os.path.join(_CONFIG_DIR, "dataset", f"{name}.yaml")
        if os.path.exists(packaged):
            res.update(_load_yaml(packaged))
    dpath = config.get("dataset_path")
    if dpath:
        for cand in (os.path.join(dpath, f"{name}.yaml") if name else None,
                     os.path.join(dpath, "data.info")):
            if cand and os.path.exists(cand):
                if cand.endswith(".info"):
                    with open(cand) as f:
                        res.update(json.load(f))
                else:
                    res.update(_load_yaml(cand))
    return res


def parse_arguments(args: Optional[Dict[str, Any]] = None,
                    argv: Optional[Iterable[str]] = None) -> Dict[str, Any]:
    """Produce the final merged config dict.

    ``args`` is the caller-provided dict (highest priority); ``argv`` a list of
    CLI tokens (next priority; defaults to empty — pass ``sys.argv[1:]`` from
    real CLIs).
    """
    args = dict(args or {})
    cmd = parse_cmd_arguments(argv if argv is not None else [])

    config = _load_yaml(os.path.join(_CONFIG_DIR, "base.yaml"))
    explicit: set = set()  # keys set by any layer above base.yaml

    # model yaml
    model_name = args.get("model") or cmd.get("model") or config.get("model")
    model_yaml = os.path.join(_CONFIG_DIR, "model", f"{model_name}.yaml")
    if os.path.exists(model_yaml):
        layer = _load_yaml(model_yaml)
        config.update(layer)
        explicit.update(layer)
    config["model"] = model_name

    # dataset yaml / data.info — dataset name+path may come from any layer
    probe = dict(config)
    probe.update(cmd)
    probe.update(args)
    layer = load_dataset_config(probe)
    config.update(layer)
    explicit.update(layer)

    # optional --config_file
    cfg_file = args.get("config_file") or cmd.get("config_file")
    if cfg_file:
        layer = _load_yaml(cfg_file)
        config.update(layer)
        explicit.update(layer)

    config.update(cmd)
    config.update(args)
    explicit.update(cmd)
    explicit.update(args)
    _apply_tpu_fast_defaults(config, explicit)
    config["cmd_args"] = cmd  # kept for re-overlay after checkpoint-config load
    return config


def _apply_tpu_fast_defaults(config: Dict[str, Any], explicit: set) -> None:
    """On a TPU backend, default the measured loss-identical fast path on.

    ``compute_dtype=bfloat16`` was loss-identical to 5 decimals in the
    recorded A/B (docs/performance_notes.md) and is what the hardware is
    built for, so it is the TPU default. Any explicit ``--compute_dtype``
    (from any config layer above base.yaml) wins, and ``--reproducible``
    restores the bit-reproducible cross-backend behavior (f32 compute +
    threefry dropout) wholesale.
    """
    if config.get("reproducible"):
        repro = {"compute_dtype": "float32",
                 "dropout_rng_impl": "threefry", "dropout_bits": 32}
        clobbered = sorted(k for k in repro
                           if k in explicit and config.get(k) != repro[k])
        if clobbered:
            # reproducible is a wholesale switch and wins, but not silently
            # — the documented rule is "explicit setting from any layer
            # wins", and these explicit values are being replaced
            import warnings
            warnings.warn(
                "--reproducible overrides explicitly-set "
                + ", ".join(f"{k}={config[k]!r}" for k in clobbered)
                + " with the bit-reproducible defaults "
                + str(repro), stacklevel=2)
        config.update(repro)
        return
    try:
        import jax
        backend = jax.default_backend()
    except Exception:  # jax not importable / no backend — keep portables
        return
    if backend == "tpu" and "compute_dtype" not in explicit:
        config["compute_dtype"] = "bfloat16"


def overlay_checkpoint_config(config: Dict[str, Any], ckpt_config: Dict[str, Any]) -> Dict[str, Any]:
    """Replace config with one stored in a checkpoint, re-applying cmd args on
    top (reference main.py:304-306,332-334)."""
    res = dict(ckpt_config)
    res.update(config.get("cmd_args", {}))
    for key in ("task", "dataset_path", "output_path", "model_file"):
        if key in config:
            res[key] = config[key]
    return res
