"""Honest A/B of train-step variants at headline bench shapes.

Variants (config overrides on bench.build):
    baseline      f32, XLA dense attention path
    bf16          compute_dtype=bfloat16 dense towers
    fused_attn    Pallas fused short-seq attention (in-kernel dropout)
    bf16+fused    both

Run: python bench/bench_step_variants.py [variant ...]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

VARIANTS = {
    "baseline": {"use_pallas": 0},
    "bf16": {"use_pallas": 0, "compute_dtype": "bfloat16"},
    "fused_attn": {"use_fused_attention": 1},
    "bf16+fused": {"use_fused_attention": 1, "compute_dtype": "bfloat16"},
    "sorted_grad": {"use_pallas": 0, "sorted_embedding_grad": 1},
    "bf16+sorted": {"use_pallas": 0, "compute_dtype": "bfloat16",
                    "sorted_embedding_grad": 1},
    # round-2b: bf16 now keeps the attention core in bf16 (mask cast in
    # modules.py); +rbg swaps dropout onto the hardware rng_bit_generator
    "bf16+rbg": {"use_pallas": 0, "compute_dtype": "bfloat16",
                 "dropout_rng_impl": "rbg"},
    # [B, L, H, d] einsum layout: dot_general carries the head axis, no
    # pre-transpose copies
    "bf16+rbg+direct": {"use_pallas": 0, "compute_dtype": "bfloat16",
                        "dropout_rng_impl": "rbg", "attn_direct_layout": 1},
    # remat each transformer layer: recompute the [B,H,L,L] intermediates in
    # backward (step is ~2% MFU, recompute is nearly free) instead of storing
    # their autodiff residuals in HBM
    "bf16+rbg+remat": {"use_pallas": 0, "compute_dtype": "bfloat16",
                       "dropout_rng_impl": "rbg", "remat_attention": 1},
    # one random BYTE per mask element instead of a u32 word
    "bf16+rbg+bits8": {"use_pallas": 0, "compute_dtype": "bfloat16",
                       "dropout_rng_impl": "rbg", "dropout_bits": 8},
    "bf16+rbg+bits8+direct": {"use_pallas": 0, "compute_dtype": "bfloat16",
                              "dropout_rng_impl": "rbg", "dropout_bits": 8,
                              "attn_direct_layout": 1},
    # packed QKV projection: one [H, 3H] matmul per layer instead of three
    "bf16+rbg+bits8+qkvpack": {"use_pallas": 0, "compute_dtype": "bfloat16",
                               "dropout_rng_impl": "rbg", "dropout_bits": 8,
                               "qkv_packed": 1},
    # round-2c kernel redo: fused attention with bf16 matmuls (f32 softmax),
    # against the measured-best XLA path (non-attention dropouts stay bits8)
    "bf16+rbg+bits8+fused": {"use_fused_attention": 1,
                             "compute_dtype": "bfloat16",
                             "dropout_rng_impl": "rbg", "dropout_bits": 8},
    "bf16+rbg+direct+remat": {"use_pallas": 0, "compute_dtype": "bfloat16",
                              "dropout_rng_impl": "rbg",
                              "attn_direct_layout": 1, "remat_attention": 1},
    # round-2c: k-slot expanded backward scatter for the item_seq gather
    # (ops/embedding.py::gather_expand) — duplicate ids stop serializing
    "bits8+expand8": {"use_pallas": 0, "compute_dtype": "bfloat16",
                      "dropout_rng_impl": "rbg", "dropout_bits": 8,
                      "expand_embedding_grad": 8},
    "bits8+expand32": {"use_pallas": 0, "compute_dtype": "bfloat16",
                       "dropout_rng_impl": "rbg", "dropout_bits": 8,
                       "expand_embedding_grad": 32},
    # round-2d: final transformer layer computes ONLY the last query position
    # (the only position SASRec consumes) — removes that layer's [B,H,L,L]
    # score/softmax/dropout traffic fwd+bwd and shrinks its FFN by L
    "bits8+lastq": {"use_pallas": 0, "compute_dtype": "bfloat16",
                    "dropout_rng_impl": "rbg", "dropout_bits": 8,
                    "last_query_only": 1},
    "bits8+nolastq": {"use_pallas": 0, "compute_dtype": "bfloat16",
                      "dropout_rng_impl": "rbg", "dropout_bits": 8,
                      "last_query_only": 0},
    # post-lastq re-tests: with the final layer single-query, the embedding
    # grad scatter (24 ms/step in the trace) is the biggest single op — the
    # earlier "wash" verdicts may not hold at the new balance
    "lastq+expand8": {"use_pallas": 0, "compute_dtype": "bfloat16",
                      "dropout_rng_impl": "rbg", "dropout_bits": 8,
                      "last_query_only": 1, "expand_embedding_grad": 8},
    "lastq+sorted": {"use_pallas": 0, "compute_dtype": "bfloat16",
                     "dropout_rng_impl": "rbg", "dropout_bits": 8,
                     "last_query_only": 1, "sorted_embedding_grad": 1},
    "lastq+remat": {"use_pallas": 0, "compute_dtype": "bfloat16",
                    "dropout_rng_impl": "rbg", "dropout_bits": 8,
                    "last_query_only": 1, "remat_attention": 1},
    "lastq+direct": {"use_pallas": 0, "compute_dtype": "bfloat16",
                     "dropout_rng_impl": "rbg", "dropout_bits": 8,
                     "last_query_only": 1, "attn_direct_layout": 1},
    "lastq+qkvpack": {"use_pallas": 0, "compute_dtype": "bfloat16",
                      "dropout_rng_impl": "rbg", "dropout_bits": 8,
                      "last_query_only": 1, "qkv_packed": 1},
    # round-2e: head-stacked attention — all heads in one [B,L,H]@[B,H,nh*L]
    # matmul against block-diagonal K'/V'; kills the [B,nh,L,*] tensors'
    # 2.9-4.4x tile padding (trace: attn core 32 ms + head-split copies
    # 15 ms of the 122 ms step) — and the f32-grad-scatter variant for the
    # 33 ms duplicate-id embedding-grad combine
    "lastq+hstack": {"use_pallas": 0, "compute_dtype": "bfloat16",
                     "dropout_rng_impl": "rbg", "dropout_bits": 8,
                     "last_query_only": 1, "attn_head_stacked": 1},
    "lastq+gradf32": {"use_pallas": 0, "compute_dtype": "bfloat16",
                      "dropout_rng_impl": "rbg", "dropout_bits": 8,
                      "last_query_only": 1, "embedding_grad_f32": 1},
    "lastq+hstack+gradf32": {"use_pallas": 0, "compute_dtype": "bfloat16",
                             "dropout_rng_impl": "rbg", "dropout_bits": 8,
                             "last_query_only": 1, "attn_head_stacked": 1,
                             "embedding_grad_f32": 1},
    # round-2f: Pallas fused dense->act->dense FFN (ops/ffn.py) — the
    # [T, inner] activation stays in VMEM: no forward HBM round-trip and no
    # autodiff residual; backward recomputes it (step is memory-bound)
    "lastq+ffn": {"use_pallas": 0, "compute_dtype": "bfloat16",
                  "dropout_rng_impl": "rbg", "dropout_bits": 8,
                  "last_query_only": 1, "use_fused_ffn": 1},
    # round-3: negative-rejection membership as binary search over sorted
    # histories (default ON) vs the [B, K, C] broadcast compare
    "lastq+cmpmem": {"use_pallas": 0, "compute_dtype": "bfloat16",
                     "dropout_rng_impl": "rbg", "dropout_bits": 8,
                     "last_query_only": 1,
                     "neg_membership_binary_search": 0},
    # round-3: dropout-mask remat — the byte masks are regenerated in the
    # backward pass from the rng key (modules.Dropout8.remat custom VJP)
    # instead of being stored as autodiff residuals between fwd and bwd
    "lastq+dropremat": {"use_pallas": 0, "compute_dtype": "bfloat16",
                        "dropout_rng_impl": "rbg", "dropout_bits": 8,
                        "last_query_only": 1, "dropout_mask_remat": 1},
    # round-3: scatter-FREE embedding grads (ops/embedding.py::gather_scan)
    # — sort + MXU blocked-cumsum + boundary gathers replace XLA's
    # row-serial scatter combine (24 ms of the 124 ms step in the r3 trace)
    "lastq+scan": {"use_pallas": 0, "compute_dtype": "bfloat16",
                   "dropout_rng_impl": "rbg", "dropout_bits": 8,
                   "last_query_only": 1, "scan_embedding_grad": 1},
    # round-4: whole-layer Pallas kernel (ops/layer.py) — each full-length
    # layer runs qkv→attention→softmax→dropout→@V→proj→LN→FFN→LN as one
    # program per batch block; only x/y touch HBM, backward recomputes from
    # x and emits per-program partial weight grads. Targets the attention
    # core + layout copies the r3 trace put at ~38 ms of the 124.7 ms step
    "lastq+fusedlayer": {"use_pallas": 0, "compute_dtype": "bfloat16",
                         "dropout_rng_impl": "rbg", "dropout_bits": 8,
                         "last_query_only": 1, "fused_layer": 1},
    # both layers whole-layer-fused (no single-query final layer): tests
    # whether in-kernel full-length attention beats the lastq shortcut
    "fusedlayer+nolastq": {"use_pallas": 0, "compute_dtype": "bfloat16",
                           "dropout_rng_impl": "rbg", "dropout_bits": 8,
                           "last_query_only": 0, "fused_layer": 1},
    # round-4b: the single-query FINAL layer fused too
    # (ops/layer.py::fused_last_query_layer) — K/V projections and their
    # per-head transposes stay in VMEM instead of round-tripping HBM
    "fusedlayer+fusedlastq": {"use_pallas": 0, "compute_dtype": "bfloat16",
                              "dropout_rng_impl": "rbg", "dropout_bits": 8,
                              "last_query_only": 1, "fused_layer": 1,
                              "fused_lastq": 1},
    # round-4c: Pallas membership for the negative-rejection compare
    # (ops/member.py) — the [B, C] history rows stay in VMEM per block
    "fused+member": {"use_pallas": 0, "compute_dtype": "bfloat16",
                     "dropout_rng_impl": "rbg", "dropout_bits": 8,
                     "last_query_only": 1, "fused_layer": 1,
                     "fused_lastq": 1, "neg_membership_pallas": 1},
    # round-5: VMEM-resident scatter-accumulate for the embedding grads
    # (ops/scatter_accum.py) — the whole [50k, 64] table accumulates in
    # VMEM, removing the ~15 ns/row HBM random-access toll of XLA's
    # scatter (24 ms of the 108 ms step; micro: 21 ms vs 24)
    "fused+vmemscatter": {"use_pallas": 0, "compute_dtype": "bfloat16",
                          "dropout_rng_impl": "rbg", "dropout_bits": 8,
                          "last_query_only": 1, "fused_layer": 1,
                          "fused_lastq": 1, "vmem_embedding_grad": 1},
}


def run_variant(name, overrides, steps=16, trace_dir=None):
    step, params, opt_state, raw, aug = bench.build(**overrides)
    key = jax.random.PRNGKey(7)
    it = iter(raw)
    for i in range(3):
        jb = aug.with_state({k: jnp.asarray(v) for k, v in next(it).items()})
        params, opt_state, loss = step(params, opt_state, jb,
                                       jax.random.fold_in(key, i))
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        if n >= steps:
            break
        jb = aug.with_state({k: jnp.asarray(v) for k, v in batch.items()})
        params, opt_state, loss = step(params, opt_state, jb,
                                       jax.random.fold_in(key, 100 + n))
        n += 1
    final_loss = float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / n
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for i in range(4):
                jb = aug.with_state({k: jnp.asarray(v)
                                     for k, v in next(iter(raw)).items()})
                params, opt_state, loss = step(params, opt_state, jb,
                                               jax.random.fold_in(key, 500 + i))
            float(jax.device_get(loss))
    print(json.dumps({
        "variant": name, "ms_per_step": round(1000 * dt, 2),
        "examples_per_sec": round(bench.BATCH / dt, 1),
        "final_loss": round(final_loss, 5),
        **({"trace_dir": trace_dir} if trace_dir else {}),
    }), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--trace")]
    trace = next((a.split("=", 1)[1] for a in sys.argv[1:]
                  if a.startswith("--trace=")), None)
    names = args or list(VARIANTS)
    for name in names:
        try:
            run_variant(name, VARIANTS[name], trace_dir=trace)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
