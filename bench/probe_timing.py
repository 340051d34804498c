"""Timing-methodology probe: is `block_until_ready` trustworthy on this backend?

Round-1 postmortem: the driver-recorded bench implied 99% of v5e bf16 peak,
which is physically impossible end-to-end — suspicion fell on async dispatch
over the axon tunnel.  This probe measures the same jitted SASRec train step
four ways and prints all of them so the discrepancy (if any) is visible:

  a) N steps, single `block_until_ready()` on the final loss   (round-1 method)
  b) N steps, single `jax.device_get()` of the final loss      (forced round-trip)
  c) per-step `jax.device_get()` (fully synchronous, upper bound on step time)
  d) a `jax.profiler` trace over a timed window -> inspect device time offline

It also prints XLA's own cost analysis (flops/bytes) for the compiled step so
every throughput number can be converted to TFLOP/s and checked against the
chip's physical peak (v5e: 197 TFLOP/s bf16, 819 GB/s HBM).

Run on the TPU:  python bench/probe_timing.py [--trace]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench.py)


def run(steps, step, params, opt_state, raw, aug, key, mode):
    it = iter(raw)
    times = []
    t0 = time.perf_counter()
    n = 0
    loss = None
    for batch in it:
        if n >= steps:
            break
        ts = time.perf_counter()
        jb = aug.with_state({k: jnp.asarray(v) for k, v in batch.items()})
        params, opt_state, loss = step(params, opt_state, jb,
                                       jax.random.fold_in(key, 100 + n))
        if mode == "per_step_get":
            float(jax.device_get(loss))
        times.append(time.perf_counter() - ts)
        n += 1
    if mode == "final_block":
        loss.block_until_ready()
    elif mode == "final_get":
        float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    return dt, n, times, params, opt_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()

    step, params, opt_state, raw, aug = bench.build()
    key = jax.random.PRNGKey(7)

    # Warmup / compile, then grab the compiled step's cost analysis.
    it = iter(raw)
    jb = aug.with_state({k: jnp.asarray(v) for k, v in next(it).items()})
    traced = step.lower(params, opt_state, jb, key)
    compiled = traced.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    bytes_ = float(ca.get("bytes accessed", float("nan")))
    print(json.dumps({"what": "cost_analysis", "flops_per_step": flops,
                      "bytes_per_step": bytes_,
                      "mflop_per_example": flops / bench.BATCH / 1e6}))

    for i in range(3):
        jb = aug.with_state({k: jnp.asarray(v) for k, v in next(it).items()})
        params, opt_state, loss = step(params, opt_state, jb,
                                       jax.random.fold_in(key, i))
    float(jax.device_get(loss))

    peak_tflops = 197.0  # v5e bf16
    for mode in ("final_block", "final_get", "per_step_get"):
        # rebuild the id stream each time (same data, fresh iterator)
        dt, n, times, params, opt_state = run(args.steps, step, params,
                                              opt_state, raw, aug, key, mode)
        thr = bench.BATCH * n / dt
        tf = thr * flops / bench.BATCH / 1e12
        print(json.dumps({
            "what": mode, "steps": n, "total_s": round(dt, 4),
            "ms_per_step": round(1000 * dt / max(n, 1), 3),
            "examples_per_sec": round(thr, 1),
            "achieved_tflops": round(tf, 2),
            "mfu": round(tf / peak_tflops, 4),
            "per_step_ms": [round(1000 * t, 2) for t in times[:8]],
        }))

    if args.trace:
        with jax.profiler.trace("/tmp/probe_trace"):
            dt, n, _, params, opt_state = run(8, step, params, opt_state,
                                              raw, aug, key, "final_get")
        print(json.dumps({"what": "trace_window", "steps": n,
                          "wall_s": round(dt, 4),
                          "trace_dir": "/tmp/probe_trace"}))


if __name__ == "__main__":
    main()
