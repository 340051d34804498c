"""Multi-host initialization.

The reference launches multi-node runs with torchrun's c10d rendezvous
(examples/training/multi_gpu_train_ml100k.sh:50). The TPU-native equivalent
is ``jax.distributed.initialize``: every host runs the same program, the
coordinator address comes from config/env, and afterwards ``jax.devices()``
spans the whole slice so the ('data','model') mesh covers it transparently.
On Cloud TPU pods the arguments are auto-detected and calling with no
arguments is correct.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

_initialized = False


def initialize_distributed(config: Optional[Dict[str, Any]] = None) -> bool:
    """Idempotent. Returns True when running multi-process."""
    global _initialized
    config = config or {}
    coord = config.get("coordinator_address") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    n_proc = config.get("num_processes") or os.environ.get("JAX_NUM_PROCESSES")
    pid = config.get("process_id") or os.environ.get("JAX_PROCESS_ID")
    if _initialized:
        return jax.process_count() > 1
    if coord is None and n_proc is None:
        return False  # single-host; nothing to do
    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = str(coord)
    if n_proc is not None:
        kwargs["num_processes"] = int(n_proc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1
