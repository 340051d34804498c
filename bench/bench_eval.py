"""One-vs-all evaluation throughput on the real chip.

The reference evaluates the full catalog in CPU numpy
(unirec/facility/evaluation/evaluator_abc.py:218-247: user_emb @ item_emb.T
per batch, then a numba rank kernel). Here the whole protocol — SASRec user
tower, full-catalog scores, history masking, tie-break noise, exact rank,
hit/ndcg@k — runs as one jit program per batch with only the per-row metric
values returning to host (facility/evaluation/evaluators.py +
ops/metrics.py::onepos_rank_full_catalog).

This measures that program end-to-end at production shapes: 50k items,
d=64, L=50 histories, 256-user eval batches.

Run on the real chip: python bench/bench_eval.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # bench.py: shared workload builder

B_EVAL = 256
N_BATCHES = 24


def main():
    from unirec_tpu import config as config_mod
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.facility.evaluation.evaluators import OnePositiveEvaluator
    from unirec_tpu.utils.registry import get_model_class

    rng = np.random.default_rng(0)
    lens = rng.integers(10, bench.HIST_CAP, size=bench.N_USERS).astype(np.int32)
    items = np.zeros((bench.N_USERS, bench.HIST_CAP), np.int32)
    mask = np.arange(bench.HIST_CAP)[None, :] < lens[:, None]
    items[mask] = rng.integers(1, bench.N_ITEMS, size=int(mask.sum()))
    history = UserHistory(items, lens)

    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": bench.N_USERS, "n_items": bench.N_ITEMS,
        "max_seq_len": bench.SEQ_LEN, "embedding_size": bench.EMB_DIM,
        "hidden_size": bench.EMB_DIM, "inner_size": 2 * bench.EMB_DIM,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce",
        "dataloader": "SeqRecDataset", "group_size": -1,
        "metrics": "['hit@10','ndcg@10','mrr@10']",
        "test_protocol": "one_vs_all", "compute_dtype": "bfloat16",
    }, argv=[])
    model = get_model_class("SASRec")(cfg=cfg)

    # init params with one example batch
    L = bench.SEQ_LEN
    def make_batch(i):
        r = np.random.default_rng(100 + i)
        uid = r.integers(1, bench.N_USERS, B_EVAL).astype(np.int32)
        hi, hl = history.gather(uid)
        seq = np.zeros((B_EVAL, L), np.int32)
        keep = np.minimum(hl, L)
        for b in range(B_EVAL):  # host-side window for the bench input only
            seq[b, L - keep[b]:] = hi[b, hl[b] - keep[b]:hl[b]]
        return {"user_id": uid,
                "item_id": r.integers(1, bench.N_ITEMS, B_EVAL).astype(np.int32),
                "label": np.ones(B_EVAL, np.float32),
                "item_seq": seq, "item_seq_len": keep.astype(np.int32),
                "weight": np.ones(B_EVAL, np.float32)}

    b0 = make_batch(0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {k: jnp.asarray(v) for k, v in b0.items()},
                           train=False)
    params = variables["params"]

    ev = OnePositiveEvaluator(cfg, model)
    batches = [make_batch(i) for i in range(N_BATCHES)]

    class ListBatcher:
        def __iter__(self):
            return iter(batches)

    # warm (compile)
    res = ev.evaluate_full(ListBatcher(), params, history)
    t0 = time.perf_counter()
    res = ev.evaluate_full(ListBatcher(), params, history)
    dt = time.perf_counter() - t0
    users = B_EVAL * N_BATCHES
    per_user_bytes = bench.N_ITEMS * bench.EMB_DIM * 2 / B_EVAL  # amortized
    print(f"one-vs-all eval ({bench.N_ITEMS} items, d={bench.EMB_DIM}, "
          f"L={bench.SEQ_LEN}, metrics {list(res)}):")
    print(f"  {users} users in {dt*1e3:.1f} ms -> "
          f"{users/dt:.0f} users/sec/chip "
          f"({1e3*dt/N_BATCHES:.2f} ms per {B_EVAL}-user batch)")
    print(f"  result: { {k: round(v, 5) for k, v in res.items()} }")


if __name__ == "__main__":
    main()
