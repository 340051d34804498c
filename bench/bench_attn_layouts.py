"""XLA attention einsum-layout A/B at bench shapes.

The per-op profile shows real layout-copy ops around attention; this
compares computing attention with heads in dim 1 (explicit transposes,
round-1 layout) vs leaving activations in [B, L, H, D] and letting einsum
carry the head dim — no physical transpose.

Run: python bench/bench_attn_layouts.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

B, L, H, D = 32768, 50, 2, 32
DROP = 0.1


def timeit(fn, args, steps=16, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    return (time.perf_counter() - t0) / steps


@jax.jit
def make(key):
    ks = jax.random.split(key, 2)
    x = jax.random.normal(ks[0], (B, L, H, D), jnp.float32)
    lens = jax.random.randint(ks[1], (B,), 1, L + 1)
    pad = (jnp.arange(L)[None, :] >= (L - lens[:, None])).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]
    mask = (1.0 - pad[:, None, None, :] * causal) * -1e4  # [B,1,L,L]
    return x, mask


def bhld(x, mask, key):
    # transpose layout (round-1): [B, H, L, D]
    q = k = v = x.transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(D))
    p = jax.nn.softmax(s + mask, axis=-1)
    keep = jax.random.bernoulli(key, 1.0 - DROP, p.shape)
    p = jnp.where(keep, p / (1.0 - DROP), 0.0)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def blhd(x, mask, key):
    # head-in-place layout: [B, L, H, D], einsum carries h
    q = k = v = x
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(D))
    p = jax.nn.softmax(s + mask, axis=-1)
    keep = jax.random.bernoulli(key, 1.0 - DROP, p.shape)
    p = jnp.where(keep, p / (1.0 - DROP), 0.0)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return ctx.reshape(B, L, H * D)


def main():
    x, mask = make(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for name, fn in (("bhld_fwd", bhld), ("blhd_fwd", blhd)):
        dt = timeit(jax.jit(fn), (x, mask, key))
        print(json.dumps({"what": name, "ms": round(1000 * dt, 2)}), flush=True)
    for name, fn in (("bhld_fwdbwd", bhld), ("blhd_fwdbwd", blhd)):
        g = jax.jit(jax.grad(lambda x, m, k: jnp.sum(fn(x, m, k) ** 2)))
        dt = timeit(g, (x, mask, key))
        print(json.dumps({"what": name, "ms": round(1000 * dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
