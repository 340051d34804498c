"""Does dispatching K train steps as ONE jitted lax.scan beat K dispatches?

The deferred (dispatch-only) bench loop still pays one host->device id
upload + one dispatch RPC per step; the r3 trace shows 122.5 ms device time
vs ~129 ms wall at bench shapes — ~6.5 ms/step of per-dispatch overhead in
this tunnel environment. Staging K batches' raw id columns as one [K, B]
upload and scanning the step body K times inside one program removes K-1 of
those round-trips (and is how a production trainer amortizes dispatch).

Run on the TPU: python bench/probe_multistep.py [K ...]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

TOTAL_STEPS = 24
WARM_GROUPS = 2


def stack_batches(batches):
    return {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
            for k in batches[0].keys()}


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 24]
    step, params0, opt_state0, raw, aug = bench.build()
    raw_step = step.__wrapped__  # unjitted body
    state = aug.state
    base_key = jax.random.PRNGKey(7)
    fold = lambda i: jax.random.fold_in(base_key, i)

    def multi(params, opt_state, xs, rngs, state):
        def body(carry, x):
            p, o = carry
            b, rng = x
            b = dict(b)
            b["_aug"] = state
            p, o, loss = raw_step(p, o, b, rng)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(body, (params, opt_state), (xs, rngs))
        return p, o, losses[-1]

    multi_j = jax.jit(multi, donate_argnums=(0, 1))

    # bench.build sizes its batcher for one warm+timed pass; draw a longer
    # id stream for the per-K warm+timed groups here
    import numpy as np
    from unirec_tpu.data.device_pipeline import RawIdBatcher
    rng = np.random.default_rng(1)
    n_rows = bench.BATCH * TOTAL_STEPS * 2
    raw = RawIdBatcher(rng.integers(1, bench.N_USERS, size=n_rows),
                       rng.integers(1, bench.N_ITEMS, size=n_rows),
                       bench.BATCH, shuffle=False)
    it = iter(raw)
    host = [next(it) for _ in range(TOTAL_STEPS * 2)]

    for K in ks:
        p = jax.tree_util.tree_map(jnp.copy, params0)
        o = jax.tree_util.tree_map(jnp.copy, opt_state0)

        def run_group(p, o, group, step0):
            if K == 1:
                b = aug.with_state({k: jnp.asarray(v)
                                    for k, v in group[0].items()})
                return step(p, o, b, fold(step0))
            xs = stack_batches(group)
            rngs = jax.vmap(fold)(jnp.arange(step0, step0 + K))
            return multi_j(p, o, xs, rngs, state)

        for w in range(WARM_GROUPS):
            p, o, loss = run_group(p, o, host[w * K:(w + 1) * K], w * K)
        float(jax.device_get(loss))

        t0 = time.perf_counter()
        n = 0
        while n + K <= TOTAL_STEPS:
            p, o, loss = run_group(p, o, host[TOTAL_STEPS + n:TOTAL_STEPS + n + K],
                                   100 + n)
            n += K
        final = float(jax.device_get(loss))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "steps_per_dispatch": K, "steps": n,
            "ms_per_step": round(1000 * dt / n, 2),
            "examples_per_sec": round(bench.BATCH * n / dt, 1),
            "final_step_loss": round(final, 5),
        }))


if __name__ == "__main__":
    main()
