"""Honest attention micro-benchmark at rec-model shapes (TPU).

Compares, at the headline bench shapes (B=32768, H=2, L=50, D=32):
  xla        dense einsum + softmax + flax dropout   (round-1 default path)
  fused      ops/attention.short_attention Pallas kernel (in-kernel dropout)
  flash      round-1 blockwise flash kernel (no dropout; eval path)

fwd-only and fwd+bwd, timing ends on a jax.device_get (see bench.py
methodology notes). Prints one JSON line per variant.

Run: python bench/bench_attention.py [--batch 32768] [--seq 50]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from unirec_tpu.ops import attention as A  # noqa: E402


def timeit(fn, args, steps=16, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf)))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--drop", type=float, default=0.1)
    ap.add_argument("--dtype", default="float32",
                    help="q/k/v dtype; bfloat16 matches the model's "
                         "compute_dtype path (kernel matmuls follow it)")
    args = ap.parse_args()
    B, H, L, D = args.batch, args.heads, args.seq, args.dim
    dtype = jnp.dtype(args.dtype)

    # generate inputs ON DEVICE — uploading ~400 MB host arrays exceeds the
    # axon tunnel's ~100 MB request-body limit (HTTP 413)
    @jax.jit
    def make_inputs(key):
        kq, kk, kv, kl = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, H, L, D), jnp.float32).astype(dtype)
        k = jax.random.normal(kk, (B, H, L, D), jnp.float32).astype(dtype)
        v = jax.random.normal(kv, (B, H, L, D), jnp.float32).astype(dtype)
        lens = jax.random.randint(kl, (B,), 1, L + 1)
        pad = (jnp.arange(L)[None, :] >= (L - lens[:, None])).astype(jnp.float32)
        causal = jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]
        # the model path casts the mask to the compute dtype (modules.py)
        mask = ((1.0 - pad[:, None, None, :] * causal)
                * A.MASK_VALUE).astype(dtype)
        return q, k, v, mask

    q, k, v, mask = make_inputs(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    seed = jnp.asarray([42], jnp.int32)

    # NB: the mask must be an ARGUMENT, not a closure constant — XLA inlines
    # closure arrays into the program and the axon compile RPC rejects
    # >~100 MB request bodies (HTTP 413)
    def xla_train(q, k, v, mask):
        # byte-mask dropout, matching the model's measured-best config
        # (dropout_bits=8, models/modules.py::Dropout8)
        p = A.xla_attention_probs(q, k, mask)
        thr = int(round(args.drop * 256.0))
        keep_p = 1.0 - thr / 256.0
        bits = jax.random.bits(key, p.shape, jnp.uint8)
        p = jnp.where(bits >= jnp.uint8(thr), p * (1.0 / keep_p),
                      jnp.zeros_like(p))
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def fused_train(q, k, v, mask):
        return A.fused_attention(q, k, v, mask, args.drop, seed)

    def flash_eval(q, k, v, mask):
        return A.flash_attention(q, k, v,
                                 jnp.broadcast_to(mask, (B, H, L, L)))

    def grad_of(f):
        return jax.jit(jax.grad(lambda q, k, v, m: jnp.sum(f(q, k, v, m) ** 2),
                                argnums=(0, 1, 2)))

    # HBM-roofline floor: fwd reads q,k,v + writes o; bwd reads q,k,v,do +
    # writes dq,dk,dv (mask excluded — it's [B,1,L,L] and real)
    isz = dtype.itemsize
    bytes_fwd = 4 * B * H * L * D * isz + B * L * L * isz
    bytes_bwd = bytes_fwd + 3 * B * H * L * D * isz + B * L * L * isz

    for name, fn, nbytes in [
        ("xla_fwd", jax.jit(xla_train), bytes_fwd),
        ("fused_fwd", jax.jit(fused_train), bytes_fwd),
        ("flash_fwd_nodrop", jax.jit(flash_eval), bytes_fwd),
        ("xla_fwdbwd", grad_of(xla_train), bytes_bwd),
        ("fused_fwdbwd", grad_of(fused_train), bytes_bwd),
    ]:
        try:
            dt = timeit(fn, (q, k, v, mask))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"what": name, "error": str(e)[:200]}))
            continue
        print(json.dumps({
            "what": name, "ms": round(1000 * dt, 3),
            "roofline_ms": round(1000 * nbytes / 819e9, 3),
            "x_roofline": round(dt / (nbytes / 819e9), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
