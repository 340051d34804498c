"""Scan fused_catalog_topk block parameters on the real chip.

One-off tuning probe behind bench/bench_topk.py: varies the selection
chunk (block-max granularity) and the kernel's item_block for the
bf16-factor serving configuration. Run on TPU; prints one JSON line per
configuration.
"""
import itertools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N, D, B, K = 1_000_000, 64, 256, 100


def make(key):
    ki, ku = jax.random.split(key)
    items = jax.random.normal(ki, (N, D), jnp.bfloat16)
    users = jax.random.normal(ku, (B, D), jnp.bfloat16)
    return items, users


def main():
    from unirec_tpu.ops.topk import fused_catalog_topk

    items, users = jax.jit(make)(jax.random.PRNGKey(0))

    for chunk, ib in itertools.product((4, 8, 16),
                                       (8192, 16384)):
        if ib is not None and ib % chunk:
            continue

        @jax.jit
        def topk(u, it, chunk=chunk, ib=ib):
            return fused_catalog_topk(u, it, K, chunk=chunk, item_block=ib)

        try:
            vals, ids = topk(users, items)
            float(jax.device_get(vals[0, 0]))
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            print(json.dumps({"chunk": chunk, "item_block": ib,
                              "error": str(e)[:120]}))
            continue
        t0 = time.perf_counter()
        for _ in range(32):
            vals, ids = topk(users, items)
        float(jax.device_get(vals[0, 0]))
        dt = (time.perf_counter() - t0) / 32
        print(json.dumps({"chunk": chunk, "item_block": ib,
                          "ms": round(1000 * dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
