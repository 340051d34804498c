"""Explicit model/dataset registries.

Replaces the reference's filesystem-walking reflection lookup
(unirec/utils/general.py:74-103) with an import-time registry: static,
typo-safe, and works in frozen/packaged environments.
"""
from __future__ import annotations

from typing import Callable, Dict, Type

_MODELS: Dict[str, type] = {}
_DATASETS: Dict[str, type] = {}


def register_model(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _MODELS[name] = cls
        return cls
    return deco


def register_dataset(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _DATASETS[name] = cls
        return cls
    return deco


def get_model_class(name: str) -> type:
    # import models lazily so registry.py has no heavy deps at import time
    from unirec_tpu import models  # noqa: F401
    if name not in _MODELS:
        raise ValueError(f"unknown model '{name}'. Registered: {sorted(_MODELS)}")
    return _MODELS[name]


def get_dataset_class(name: str) -> type:
    from unirec_tpu import data  # noqa: F401
    if name not in _DATASETS:
        raise ValueError(f"unknown dataset type '{name}'. Registered: {sorted(_DATASETS)}")
    return _DATASETS[name]


def registered_models() -> Dict[str, type]:
    from unirec_tpu import models  # noqa: F401
    return dict(_MODELS)
