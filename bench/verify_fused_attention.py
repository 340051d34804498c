"""On-TPU validation of the fused short-seq attention kernel (run manually;
results recorded in docs/performance_notes.md).

1. mask-replay consistency: output is LINEAR in v for a fixed dropout mask,
   so <g, f(v+dv) - f(v)> must equal <vjp_v(g), dv> exactly up to matmul
   rounding — this fails if the backward kernel's PRNG replay diverges from
   the forward's. (measured rel err 0.55% = bf16 MXU rounding)
2. exact-gradient check: extract the kernel's actual dropout mask via a
   v=identity-basis forward pass, rebuild the whole chain in f64 numpy with
   that mask, and compare dq/dk/dv from the bwd kernel against the f64
   reference. (measured rel err 0.3-0.4% on all three)

Usage: python bench/verify_fused_attention.py
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from unirec_tpu.ops import attention as A  # noqa: E402


def replay_consistency(B=256, H=2, L=50, D=32, p=0.1):
    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 5)
        shapes = [(B, H, L, D)] * 5
        return [jax.random.normal(k, s, jnp.float32)
                for k, s in zip(ks, shapes)]

    q, k, v, dv, g = mk(jax.random.PRNGKey(0))
    mask = jnp.zeros((B, 1, L, L), jnp.float32)
    seed = jnp.asarray([3], jnp.int32)
    f = lambda vv: A.fused_attention(q, k, vv, mask, p, seed)
    lhs = float(jnp.vdot(g, f(v + dv) - f(v)))
    _, vjp_fn = jax.vjp(f, v)
    rhs = float(jnp.vdot(vjp_fn(g)[0], dv))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-9)
    print(f"replay consistency rel err: {rel:.5f}")
    assert rel < 0.02, rel


def exact_gradients(B=8, H=2, L=16, D=32, p=0.1):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
               for _ in range(3))
    mask_np = np.where(np.tril(np.ones((L, L)))[None, None], 0,
                       -1e4).astype(np.float32)
    mask = jnp.asarray(np.broadcast_to(mask_np, (B, 1, L, L)))
    seed = jnp.asarray([3], jnp.int32)

    vI = jnp.zeros((B, H, L, D)).at[:, :, :, :L].set(jnp.eye(L))
    Z = np.asarray(A.fused_attention(q, k, vI, mask, p, seed))[:, :, :, :L]
    keep = Z > 0

    qf, kf, vf = (np.asarray(x, np.float64) for x in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", qf / np.sqrt(D), kf) + mask_np
    y = np.exp(s - s.max(-1, keepdims=True))
    y /= y.sum(-1, keepdims=True)
    z = np.where(keep, y / (1 - p), 0.0)

    g = rng.normal(size=(B, H, L, D))
    _, vjp = jax.vjp(lambda q, k, v: A.fused_attention(q, k, v, mask, p, seed),
                     q, k, v)
    dq, dk, dv = (np.asarray(x, np.float64)
                  for x in vjp(jnp.asarray(g, jnp.float32)))
    dz = np.einsum("bhqd,bhkd->bhqk", g, vf)
    dv_ref = np.einsum("bhqk,bhqd->bhkd", z, g)
    dy = np.where(keep, dz / (1 - p), 0.0)
    ds = y * (dy - (dy * y).sum(-1, keepdims=True))
    dq_ref = np.einsum("bhqk,bhkd->bhqd", ds, kf) / np.sqrt(D)
    dk_ref = np.einsum("bhqk,bhqd->bhkd", ds, qf) / np.sqrt(D)
    for name, a, b in (("dq", dq, dq_ref), ("dk", dk, dk_ref),
                       ("dv", dv, dv_ref)):
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        print(f"{name} rel err vs f64+extracted-mask: {rel:.5f}")
        assert rel < 0.02, (name, rel)


if __name__ == "__main__":
    replay_consistency()
    exact_gradients()
    print("fused attention kernel validated")
