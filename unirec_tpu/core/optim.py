"""Optimizers + LR schedulers on optax.

Covers the reference Trainer's optimizer menu (trainer.py:134-152:
adam/sgd/adagrad/rmsprop/sparse_adam/adamw) and its two schedulers
(trainer.py:154-162: StepLR(step_size=1) and ReduceLROnPlateau(mode=max,
patience=1)). The learning rate is an injected hyperparameter so the host can
rescale it between epochs without recompiling, which is how both schedulers
are realized under jit.

Note the reference's Adam applies L2 via torch's ``weight_decay`` (added to
the gradient), so we use optax.add_decayed_weights *before* the Adam scaling
for 'adam' and optax.adamw semantics only for 'adamw'.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import optax


def build_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    opt_type = config.get("optimizer", "adam")
    lr = float(config.get("learning_rate", 1e-3))
    wd = float(config.get("weight_decay", 0.0) or 0.0)
    clip = float(config.get("grad_clip_value", -1) or -1)

    chain = []
    if clip and clip > 0:
        # reference clips the global grad norm (trainer.py:347-348)
        chain.append(optax.clip_by_global_norm(clip))
    if wd > 0 and opt_type != "adamw":
        # torch-style weight decay: grad += wd * param
        chain.append(optax.add_decayed_weights(wd))

    if opt_type == "adam":
        core = optax.scale_by_adam()
    elif opt_type == "sgd":
        core = optax.identity()
    elif opt_type == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.0)
    elif opt_type == "rmsprop":
        core = optax.scale_by_rms()
    elif opt_type in ("adamw",):
        core = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(wd))
    elif opt_type == "sparse_adam":
        core = optax.scale_by_adam()
    else:
        core = optax.scale_by_adam()
    chain.append(core)

    def _make(learning_rate):
        return optax.chain(*chain, optax.scale(-1.0), optax.scale(learning_rate))

    tx = optax.inject_hyperparams(lambda learning_rate: _make(learning_rate))(
        learning_rate=lr)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected lr (host-side scheduler step)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class PlateauScheduler:
    """ReduceLROnPlateau(mode='max', patience=1, threshold=1e-4 rel) —
    matches torch defaults used at trainer.py:158-159."""

    def __init__(self, factor: float, patience: int = 1, threshold: float = 1e-4,
                 min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = None
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if self.best is None or metric > self.best * (1.0 + self.threshold) or (
                self.best < 0 and metric > self.best * (1.0 - self.threshold)):
            self.best = metric
            self.num_bad = 0
            return lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    # plateau tracking must survive auto_resume or the resumed run's LR
    # trajectory diverges from the uninterrupted one
    def state_dict(self):
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, s):
        self.best = s.get("best")
        self.num_bad = int(s.get("num_bad", 0) or 0)


class StepScheduler:
    """StepLR(step_size=1): lr *= factor every epoch (trainer.py:156)."""

    def __init__(self, factor: float):
        self.factor = factor

    def step(self, metric: float, lr: float) -> float:
        return lr * self.factor

    def state_dict(self):
        return {}

    def load_state_dict(self, s):
        pass


def build_scheduler(config: Dict[str, Any]):
    kind = config.get("scheduler", "reduce")
    factor = float(config.get("scheduler_factor", 0.1))
    if kind == "step":
        return StepScheduler(factor)
    if kind == "reduce":
        return PlateauScheduler(factor)
    return None
