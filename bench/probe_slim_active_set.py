"""Measure SLIM active-set CD quality vs the exact full CD at a realistic
catalog size (VERDICT r3: the active-set K=256 auto-engages above 4,096
items with no measured quality bound — the internal exactness test runs at
n=120 only).

Builds a popularity-skewed implicit-feedback graph (Zipf item popularity,
the shape real catalogs have), holds out each user's last item
(leave-one-out), solves SLIM with the exact full cyclic CD and with the
active-set restriction at several K, and reports:

  - rel_frob:  ||W_K - W_full||_F / ||W_full||_F
  - mass_recall: fraction of W_full's weight mass captured by W_K's support
  - hit@10 / ndcg@10 on the held-out items for each solution

Run on the real chip (full CD at N=5000 is ~N^3 per sweep — MXU work):
    python bench/probe_slim_active_set.py [N_ITEMS]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import scipy.sparse as ssp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirec_tpu.models.solvers import SLIM

N_ITEMS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_USERS = 4 * N_ITEMS
INTER_PER_USER = 24
L1, L2, SWEEPS = 0.004, 0.098, 30
KS = (64, 128, 256, 512)


def build_graph(rng):
    # Zipf-ish popularity: p(i) ∝ 1/(i+10)^0.8
    pop = 1.0 / np.power(np.arange(N_ITEMS) + 10.0, 0.8)
    pop /= pop.sum()
    rows, cols = [], []
    held = np.zeros(N_USERS, np.int64)
    for u in range(N_USERS):
        n = rng.integers(INTER_PER_USER // 2, INTER_PER_USER * 2)
        items = rng.choice(N_ITEMS, size=n, replace=False, p=pop)
        held[u] = items[-1]
        rows.extend([u] * (n - 1))
        cols.extend(items[:-1])
    data = np.ones(len(rows), np.float32)
    graph = ssp.csr_matrix((data, (rows, cols)), shape=(N_USERS, N_ITEMS))
    return graph, held


def eval_loo(graph, W, held, ks=(10,)):
    """Leave-one-out hit@k/ndcg@k with history masking, batched."""
    hits = {k: 0.0 for k in ks}
    ndcgs = {k: 0.0 for k in ks}
    B = 512
    for s in range(0, N_USERS, B):
        users = slice(s, min(s + B, N_USERS))
        scores = np.asarray(graph[users] @ W)
        # mask history
        sub = graph[users].tocoo()
        scores[sub.row, sub.col] = -np.inf
        tgt = held[users]
        tgt_score = scores[np.arange(scores.shape[0]), tgt]
        rank = (scores > tgt_score[:, None]).sum(1)  # strictly-greater rank
        for k in ks:
            hit = rank < k
            hits[k] += hit.sum()
            ndcgs[k] += (1.0 / np.log2(rank + 2.0) * hit).sum()
    n = float(N_USERS)
    return ({k: v / n for k, v in hits.items()},
            {k: v / n for k, v in ndcgs.items()})


def main():
    import jax
    print(f"backend={jax.default_backend()} N={N_ITEMS} U={N_USERS}",
          file=sys.stderr)
    rng = np.random.default_rng(7)
    graph, held = build_graph(rng)
    n = float(graph.shape[0])
    G = (graph.T @ graph).toarray().astype(np.float32)

    import time
    t0 = time.time()
    W_full = SLIM._solve_full(G, n, L1, L2, SWEEPS)
    t_full = time.time() - t0
    h, nd = eval_loo(graph, W_full, held)
    full_norm = np.linalg.norm(W_full)
    full_mass = np.abs(W_full).sum()
    out = {"n_items": N_ITEMS, "n_users": N_USERS, "sweeps": SWEEPS,
           "full": {"seconds": round(t_full, 2), "nnz": int((W_full > 0).sum()),
                    "hit@10": round(h[10], 5), "ndcg@10": round(nd[10], 5)}}

    for K in KS:
        t0 = time.time()
        W_k = SLIM._solve_active_set(G, n, L1, L2, SWEEPS, K)
        t_k = time.time() - t0
        hk, ndk = eval_loo(graph, W_k, held)
        support = W_k > 0
        mass_recall = float(np.abs(W_full[support]).sum() / max(full_mass, 1e-12))
        out[f"K={K}"] = {
            "seconds": round(t_k, 2),
            "rel_frob": round(float(np.linalg.norm(W_k - W_full) / full_norm), 5),
            "mass_recall": round(mass_recall, 5),
            "hit@10": round(hk[10], 5), "ndcg@10": round(ndk[10], 5),
            "hit_ratio_vs_full": round(hk[10] / max(h[10], 1e-12), 5),
        }
        print(json.dumps({f"K={K}": out[f"K={K}"]}), file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
