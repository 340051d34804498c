"""Micro A/B of embedding-gradient scatter-add strategies at bench shapes.

The train-step profile (bench/xplane.py) shows the item_seq gather's
backward — a scatter-add of M=1.6M [64]-rows into a [50k, 64] table — at
~24 ms/step, an order of magnitude over its ~0.5 ms memory roofline,
serialization-bound on duplicate ids (popular items collide ~32x on
average). bf16 accumulation did not move it; a sort-based rewrite lost
(the argsort costs more than the scatter saves).

Candidates measured here:
  plain      dtable.at[ids].add(g)                      (the current path)
  expand K   scatter into [N*K, D] at slot id*K + (i%K), then
             reshape(N, K, D).sum(1) — spreads each id's duplicates over K
             independent slots so the average collision chain drops ~K-fold,
             at the cost of a K-fold larger intermediate (+ its reduce);
             numerics = same additions in a different order
  onehot-mm  windows' one-hot matmul: einsum over a [chunk, N] one-hot —
             MXU-bound, O(M*N*D) FLOPs; only viable for small catalogs,
             included to calibrate where the crossover would be

Run: python bench/bench_scatter.py [M] [N] [K ...] [--dist=uniform|zipf]

The bench train step's ids are uniform over the catalog (bench.py builds
histories with rng.integers), so --dist=uniform (the default) is the
representative mode; zipf is kept as the stress case for real-world
long-tail catalogs (where it measured plain=20.9 s vs expand=0.3 s).

MEASURED (v5e, M=1.6M, N=50k, D=64): standalone plain scatter is
catastrophic — 15.6 s uniform / 20.9 s zipf vs expand8 33 ms — yet the
same op inside the jitted train-step backward costs only ~24 ms, and the
in-step A/B of expand8 is a wash (bench/bench_step_variants.py: 185.1 vs
186.9 ms/step). XLA compiles the fused gather-backward scatter ~650x
better than the isolated op: do NOT extrapolate this micro-benchmark to
the step in either direction (docs/performance_notes.md).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # forced round trip (block_until_ready over the tunnel was once broken)
    float(jax.device_get(jnp.asarray(out).ravel()[0]))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    dist = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--dist=")), "uniform")
    M = int(argv[0]) if len(argv) > 0 else 32_768 * 50
    N = int(argv[1]) if len(argv) > 1 else 50_000
    Ks = [int(a) for a in argv[2:]] or [8, 32]
    D = 64

    @jax.jit
    def make(key):
        ki, kg = jax.random.split(key)
        u = jax.random.uniform(ki, (M,))
        if dist == "zipf":
            # squared uniform concentrates mass like a rec-catalog long tail
            ids = (u * u * (N - 1)).astype(jnp.int32) + 1
        else:
            ids = (u * (N - 1)).astype(jnp.int32) + 1
        g = jax.random.normal(kg, (M, D), jnp.float32).astype(jnp.bfloat16)
        return ids, g

    ids, g = make(jax.random.PRNGKey(0))
    jax.block_until_ready((ids, g))

    def plain(ids, g):
        return jnp.zeros((N, D), jnp.bfloat16).at[ids].add(g)

    def expand_k(K):
        def expand(ids, g):
            slot = ids * K + (jnp.arange(M, dtype=jnp.int32) % K)
            wide = jnp.zeros((N * K, D), jnp.bfloat16).at[slot].add(g)
            return wide.reshape(N, K, D).sum(axis=1, dtype=jnp.bfloat16)
        return expand

    results = {"M": M, "N": N, "dist": dist}
    results["plain_ms"] = round(timeit(jax.jit(plain), ids, g), 2)
    a = jax.jit(plain)(ids, g).astype(jnp.float32)
    for K in Ks:
        fn = jax.jit(expand_k(K))
        results[f"expand{K}_ms"] = round(timeit(fn, ids, g), 2)
        # numerics: same additions, different order — compare in f32
        b = fn(ids, g).astype(jnp.float32)
        results[f"expand{K}_max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
