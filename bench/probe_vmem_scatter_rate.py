"""Probe: how fast can a Pallas kernel do dynamic-index row accumulation
into a VMEM-resident table?

XLA's scatter-add combines update rows one dynamic-update-slice at a time
(~15 ns/row measured in the bench step: 1.6M rows -> 24 ms). If a Pallas
fori_loop doing `acc[id] += row` against a VMEM accumulator can beat that
issue rate significantly, a streaming scatter kernel (sequential HBM reads,
random VMEM writes) is worth building; if it is also ~15 ns/row, the
row-serialization is a hardware issue-rate wall and the idea dies here.

Run on the real chip: python bench/probe_vmem_scatter_rate.py
"""
from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192          # accumulator rows (1 MB bf16 at D=64 -> fits VMEM easily)
D = 64
BLOCK = 16384     # update rows per grid step
STEPS = 32        # grid steps -> M = BLOCK * STEPS update rows
M = BLOCK * STEPS


def kernel(ids_ref, rows_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        idx = ids_ref[i]
        out_ref[pl.ds(idx, 1), :] += rows_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnums=())
def run(ids, rows):
    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(ids, rows)


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, size=M).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    out = run(ids, rows)
    out.block_until_ready()

    # correctness vs numpy
    ref = np.zeros((N, D), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(rows, np.float32))
    got = np.asarray(out, np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"relative max err vs f32 numpy (f32 acc): {err:.4f}")

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(ids, rows)
    float(jax.device_get(out.sum()))
    dt = (time.perf_counter() - t0) / reps
    print(f"{M} rows in {1e3*dt:.2f} ms -> {1e9*dt/M:.2f} ns/row "
          f"(XLA in-step scatter reference: ~15 ns/row)")


if __name__ == "__main__":
    main()
