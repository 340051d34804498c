"""Distributed full-catalog scoring + exact top-k.

The reference scores the catalog in CPU numpy and ranks with argpartition
(evaluator_abc.py:218-247, reco_topk.py:56). On a multi-chip mesh the item
embedding table lives row-sharded over the 'model' axis; every shard scores
its local rows on the MXU (bias-free catalogs run the fused Pallas blockmax
pass, so the [B, n_local] score slab never touches HBM), takes a local
top-k, and only the k candidates per shard (values + global ids) cross the
ICI in an all-gather — exact top-k with n_items/n_shards memory and
O(k·n_shards) communication per row.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirec_tpu.ops.common import mm_precision
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INTERPRET = False  # flipped by tests / the dryrun CPU fallback


def full_catalog_scores(model, variables, batch, item_emb, tau: float = 1.0):
    """Shared full-catalog scoring: user emb × item table + bias terms / tau
    (the one definition used by the evaluators, reco_topk and the MoRec
    signal gatherer — reference recommender.py:46-96 semantics)."""
    user_emb = model.apply(variables, batch, method="user_emb")
    scores = user_emb @ item_emb.T
    ub, ib = model.apply(variables, method="bias_terms")
    if ib is not None:
        scores = scores + ib[None, :]
    if ub is not None:
        scores = scores + ub[batch["user_id"]][:, None]
    return scores / tau


def sharded_catalog_topk(user_emb: jnp.ndarray, item_emb: jnp.ndarray,
                         k: int, mesh: Mesh,
                         item_bias: Optional[jnp.ndarray] = None,
                         axis: str = "model",
                         n_real: Optional[int] = None,
                         item_scale: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(values [B, k], global item ids [B, k]) for row-sharded item_emb.

    user_emb: [B, D] (replicated); item_emb: [N, D] sharded over ``axis``.
    N must be divisible by the axis size; pass ``n_real`` (the unpadded item
    count from ``place_item_table``) so zero-padded rows are masked to -inf
    and can never outrank real items. ``item_scale`` ([N], sharded like the
    table) enables int8 catalogs — each shard dequantizes locally, halving
    its catalog read/footprint (see ``quantize_catalog``).
    """
    n_shards = mesh.shape[axis]
    N = item_emb.shape[0]
    assert N % n_shards == 0, (N, n_shards)
    n_local = N // n_shards
    n_real = N if n_real is None else int(n_real)
    if k > n_real:
        raise ValueError(f"top-{k} requested from a {n_real}-item catalog")
    k_local = min(k, n_local)  # a shard can contribute at most n_local items

    bias_spec = P(axis) if item_bias is not None else P()
    scale_spec = P(axis) if item_scale is not None else P()

    def kernel(u, it, ib, isc):
        offset = jax.lax.axis_index(axis) * n_local
        if item_bias is None:
            # bias-free: per-shard fused pass — the [B, n_local] score
            # slab never touches HBM (same kernel as the single-chip
            # path; zero-padded tail rows past the global n_real are
            # banned via the traced invalid_from bound)
            v, i = fused_catalog_topk(
                u, it, k_local,
                invalid_from=jnp.clip(n_real - offset, 0, n_local),
                max_invalid=min(n_local, N - n_real),
                item_scale=isc if item_scale is not None else None)
        else:
            ite = it.astype(jnp.bfloat16) if item_scale is not None else it
            local = jnp.dot(u, ite.T, preferred_element_type=jnp.float32)
            if item_scale is not None:
                local = local * isc[None, :]
            local = local + ib[None, :]
            gids = offset + jnp.arange(n_local)
            local = jnp.where(gids[None, :] >= n_real, -jnp.inf, local)
            v, i = fast_topk(local, k_local)                # [B, k_local]
        i = i + offset
        # k_local candidates per shard cross the ICI
        vs = jax.lax.all_gather(v, axis, axis=1)            # [B, S, k_local]
        ids = jax.lax.all_gather(i, axis, axis=1)
        vs = vs.reshape(vs.shape[0], -1)
        ids = ids.reshape(ids.shape[0], -1)
        v2, sel = jax.lax.top_k(vs, k)
        return v2, jnp.take_along_axis(ids, sel, axis=1)

    # the replication checker can't statically prove the all_gather outputs
    # are identical across shards (they are); disable the check
    try:
        fn = shard_map(kernel, mesh=mesh,
                       in_specs=(P(), P(axis, None), bias_spec, scale_spec),
                       out_specs=(P(), P()), check_vma=False)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(kernel, mesh=mesh,
                       in_specs=(P(), P(axis, None), bias_spec, scale_spec),
                       out_specs=(P(), P()), check_rep=False)
    ib = item_bias if item_bias is not None else jnp.zeros((N,), jnp.float32)
    isc = item_scale if item_scale is not None \
        else jnp.zeros((N,), jnp.float32)
    return fn(user_emb, item_emb, ib, isc)


def masked_sharded_topk(user_emb, item_emb_sharded, hist_items, hist_len,
                        k: int, mesh: Mesh,
                        item_bias=None, axis: str = "model",
                        n_real: Optional[int] = None,
                        exclude_pad_item: bool = True,
                        item_scale=None):
    """Exact top-k over a row-sharded catalog with user-history exclusion.

    History masking is exact without any per-shard scatter: at most
    ``hist_items.shape[1]`` candidates per row can be history (plus the
    padding item), so fetching ``k + C (+1)`` sharded candidates and
    filtering afterwards always leaves >= k valid survivors.
    Returns (values [B, k], ids [B, k]).
    """
    C = hist_items.shape[1]
    fetch = k + C + (1 if exclude_pad_item else 0)
    if n_real is not None:
        fetch = min(fetch, int(n_real))
    vals, ids = sharded_catalog_topk(user_emb, item_emb_sharded, fetch, mesh,
                                     item_bias=item_bias, axis=axis,
                                     n_real=n_real, item_scale=item_scale)
    valid_h = jnp.arange(C)[None, :] < hist_len[:, None]
    hcols = jnp.where(valid_h, hist_items, -1)
    banned = (ids[:, :, None] == hcols[:, None, :]).any(-1)
    if exclude_pad_item:
        banned |= ids == 0
    keep_vals = jnp.where(banned, -jnp.inf, vals)
    v2, sel = jax.lax.top_k(keep_vals, k)
    return v2, jnp.take_along_axis(ids, sel, axis=1)


def place_item_table(item_emb, mesh: Mesh, axis: str = "model"):
    """Row-shard a [N, D] table over ``axis``, zero-padding N to a multiple
    of the axis size. Returns (sharded table, padded N)."""
    n_shards = mesh.shape[axis]
    N, D = item_emb.shape
    pad = (-N) % n_shards
    if pad:
        item_emb = jnp.concatenate(
            [item_emb, jnp.zeros((pad, D), item_emb.dtype)], axis=0)
    sharded = jax.device_put(item_emb, NamedSharding(mesh, P(axis, None)))
    return sharded, N + pad


def fast_topk(x: jnp.ndarray, k: int, chunk: int = 32,
              exact: bool = True, recall_target: float = 0.95,
              margin: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (or approximate) top-k along the last axis that stays fast at
    catalog scale.

    ``jax.lax.top_k`` on TPU lowers to a full variadic sort of the last
    dimension — measured 90-111 ms for top-100 over a [256, 1M] score
    matrix (bench/bench_topk.py), ~300x over the catalog-read HBM floor; a
    per-chunk-sort formulation measured even worse (175 ms: many small
    variadic sorts). Two paths:

    - exact=True: **block-max selection.** Split the row into blocks of
      ``chunk`` lanes; one streaming reduce takes each block's max; the
      true top-k provably lives inside the k blocks with the largest
      maxima (a block whose max exceeds the true k-th value contains an
      element exceeding it, and at most k-1 elements do), so gathering
      those k blocks and sorting k*chunk survivors is exact in the top-k
      VALUES (tie ORDER at the boundary value may differ from lax.top_k's
      index order). The full-row variadic sort disappears; the remaining
      sorts see nb = N/chunk and k*chunk elements. Measured 8.8 ms for
      top-100 over [256, 1M] at chunk=32 (the measured optimum over
      chunk in {8..8192}) — 12.6x over lax.top_k, 28x the HBM floor.
    - exact=False: ``jax.lax.approx_max_k`` (TPU-native PartialReduce op)
      with the given recall target — the serving-grade path, matching the
      reference's optional faiss-style approximations.
    """
    del margin
    N = x.shape[-1]
    if not exact:
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    nb = -(-N // chunk)
    if k >= nb or N <= 4 * k * chunk:
        return jax.lax.top_k(x, k)
    pad = nb * chunk - N
    if pad:
        x = jnp.concatenate(
            [x, jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)], axis=-1)
    xr = x.reshape(x.shape[:-1] + (nb, chunk))
    bmax = xr.max(-1)                                    # [..., nb]
    _, blk = jax.lax.top_k(bmax, k)                      # k winning blocks
    cand = jnp.take_along_axis(xr, blk[..., None], axis=-2)  # [..., k, chunk]
    v, ci = jax.lax.top_k(cand.reshape(x.shape[:-1] + (k * chunk,)), k)
    ids = jnp.take_along_axis(blk, ci // chunk, axis=-1) * chunk + ci % chunk
    return v, ids


def quantize_catalog(item_emb: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization of an item-factor table:
    ``q[i] = round(e[i] / scale[i])`` with ``scale[i] = max|e[i]| / 127``.

    Halves (vs bf16) or quarters (vs f32) the catalog's HBM footprint and
    its serving-path read — 2M items x d=64 fit where 1M bf16 did. Scores
    computed from (q, scale) are approximate; the fused top-k over them is
    exact w.r.t. the QUANTIZED scores, and the realized ranking recall vs
    full precision is measured in bench/probe_int8_recall.py."""
    item_emb = item_emb.astype(jnp.float32)
    scale = jnp.max(jnp.abs(item_emb), axis=1) / 127.0
    scale = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(item_emb / scale[:, None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _blockmax_kernel(u_ref, it_ref, bm_ref, *, ch):
    # scores TRANSPOSED ([items, users]) so the ch-item group max is a
    # sublane reduction — the [IB, UB] -> [IB/ch, ch, UB] reshape is a free
    # view (leading-dim split), no lane relayout
    s = jax.lax.dot_general(it_ref[:], u_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_precision(it_ref.dtype,
                                                   u_ref.dtype))
    bm_ref[:] = s.reshape(s.shape[0] // ch, ch, s.shape[1]).max(axis=1)


def _blockmax_kernel_q(u_ref, it_ref, sc_ref, bm_ref, *, ch):
    # int8 items dequantize in VMEM: the HBM read is 1 byte/element. The
    # int8->bf16 convert is exact and bf16 x bf16 products of 8-bit
    # mantissas accumulate exactly in f32, so these scores equal the XLA
    # dequantized-dense scores bit for bit.
    it = it_ref[:].astype(jnp.bfloat16)
    s = jax.lax.dot_general(it, u_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_precision(it.dtype, u_ref.dtype))
    s = s * sc_ref[:]                       # [IB, 1] per-item scales
    bm_ref[:] = s.reshape(s.shape[0] // ch, ch, s.shape[1]).max(axis=1)


def catalog_blockmax(user_emb: jnp.ndarray, item_emb_padded: jnp.ndarray,
                     chunk: int, item_block: int,
                     interpret: bool = False,
                     item_scale_padded: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Per-``chunk``-item-block score maxima, [B, N/chunk], WITHOUT ever
    writing the [B, N] score matrix to HBM (a Pallas kernel keeps each
    [item_block, B] score tile in VMEM and reduces it there). The score
    arithmetic matches ``dot_general(u, items, contract D x D)`` with f32
    accumulation. Measured 1.25 ms for [256 users x 1M items x d=64]
    vs 4.3 ms for XLA's matmul+reduce (bench/bench_topk.py).

    Cited reference behavior: unirec/main/reco_topk.py:70-96 scores the
    full catalog per user batch; this kernel is the TPU-native scoring
    pass that never writes those scores out."""
    n_pad, d = item_emb_padded.shape
    b = user_emb.shape[0]
    assert item_block % chunk == 0 and n_pad % item_block == 0
    ub = min(b, 256)
    b_pad = -(-b // ub) * ub if b > 256 else -(-b // 8) * 8
    ub = min(b_pad, 256)
    if b_pad != b:
        user_emb = jnp.concatenate(
            [user_emb, jnp.zeros((b_pad - b, d), user_emb.dtype)])
    nj = n_pad // item_block
    nu = b_pad // ub
    quantized = item_scale_padded is not None
    kernel = _blockmax_kernel_q if quantized else _blockmax_kernel
    in_specs = [
        pl.BlockSpec((ub, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((item_block, d), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [user_emb, item_emb_padded]
    if quantized:
        in_specs.append(pl.BlockSpec((item_block, 1), lambda i, j: (j, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(item_scale_padded.reshape(n_pad, 1))
    bmT = pl.pallas_call(
        functools.partial(kernel, ch=chunk),
        grid=(nu, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((item_block // chunk, ub),
                               lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // chunk, b_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b_pad,
            bytes_accessed=(nu * n_pad * d * item_emb_padded.dtype.itemsize
                            + (n_pad // chunk) * b_pad * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return bmT.T[:b]


def fused_catalog_topk(user_emb: jnp.ndarray, item_emb: jnp.ndarray, k: int,
                       *, chunk: int = 16, item_block: Optional[int] = None,
                       hist_items: Optional[jnp.ndarray] = None,
                       hist_len: Optional[jnp.ndarray] = None,
                       keep_ids: Optional[jnp.ndarray] = None,
                       exclude_pad_item: bool = False,
                       invalid_from: Optional[jnp.ndarray] = None,
                       max_invalid: int = 0,
                       interpret: Optional[bool] = None,
                       item_scale: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact single-chip top-k directly from the factors (user_emb [B, D],
    item_emb [N, D]) — the [B, N] score matrix never touches HBM.

    Two passes: (1) the ``catalog_blockmax`` Pallas kernel streams the
    catalog once and emits only per-``chunk``-block score maxima; (2) the
    k' blocks with the largest maxima (a proven superset of the true top-k
    — see ``fast_topk``; k' adds headroom for catalog padding and masked
    candidates) are re-scored from their item vectors and sorted. Measured
    for top-100 over [256 users x 1M items x d=64] (bench/bench_topk.py,
    chunk=16 per the bench/probe_topk_chunk.py A/B): 7.2 ms vs 8.3 ms for
    matmul + ``fast_topk`` and ~91 ms for matmul + ``lax.top_k`` with f32
    factors; 5.2 ms with bf16 factors (the serving-recommended table
    dtype — halves the catalog read; 17.5x over matmul + ``lax.top_k``).
    Returned ids match ``lax.top_k`` of the dense
    scores exactly (tested incl. adversarial cases); values agree to 1 ulp
    (pass-2 re-scores with a differently-shaped contraction).

    ``hist_items``/``hist_len`` exclude per-user history from the results
    (reference reco_topk.py:81-85 semantics) and ``keep_ids`` [B] exempts
    one id per user (the held-out ``last_item`` target). History exclusion
    works by block overfetch: at most hist+pad candidates can be banned, so
    fetching k + hist_cap + chunk blocks keeps the result exact.

    ``invalid_from`` (traced scalar) bans every local row id >= it —
    used by ``sharded_catalog_topk`` where a shard's tail rows past the
    global ``n_real`` are zero padding at a shard-dependent (traced)
    offset. ``max_invalid`` must statically bound how many rows can be
    banned this way; it buys the block overfetch that keeps the result
    exact (same argument as history exclusion).
    """
    B, D = user_emb.shape
    N = item_emb.shape[0]
    if interpret is None:
        interpret = _INTERPRET or jax.default_backend() != "tpu"
    if item_block is None:
        item_block = min(8192, max(chunk,
                                   (2 << 20) // max(2 * D, 1) // chunk * chunk))
    hcap = 0 if hist_items is None else int(hist_items.shape[1])
    icap = (-(-max_invalid // chunk) + 1) if invalid_from is not None else 0
    kp = (k + (chunk if N % chunk else 0) + (1 if exclude_pad_item else 0)
          + hcap + icap)
    nb_real = -(-N // chunk)

    if hist_items is not None:
        valid_h = jnp.arange(hcap)[None, :] < hist_len[:, None]
        hcols = jnp.where(valid_h, hist_items, -1)
        if keep_ids is not None:
            hcols = jnp.where(hcols == keep_ids[:, None], -1, hcols)

    def _mask_candidates(sc, iid):
        sc = jnp.where(iid < N, sc, -jnp.inf)
        if invalid_from is not None:
            sc = jnp.where(iid >= invalid_from, -jnp.inf, sc)
        if exclude_pad_item:
            sc = jnp.where(iid == 0, -jnp.inf, sc)
        if hist_items is not None:
            banned = (iid[:, :, None] == hcols[:, None, :]).any(-1)
            sc = jnp.where(banned, -jnp.inf, sc)
        return sc

    quantized = item_scale is not None
    if quantized:
        assert item_emb.dtype == jnp.int8, "item_scale requires int8 items"

    if kp >= nb_real or N <= 4 * k * chunk:   # dense fallback at small N
        ie = item_emb.astype(jnp.bfloat16) if quantized else item_emb
        sc = jax.lax.dot_general(user_emb, ie, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if quantized:
            sc = sc * item_scale[None, :]
        iid = jnp.broadcast_to(jnp.arange(N)[None, :], sc.shape)
        return fast_topk(_mask_candidates(sc, iid), k, chunk=chunk)

    n_pad = -(-N // item_block) * item_block
    scale_pad = None
    if n_pad != N:
        item_emb = jnp.concatenate(
            [item_emb, jnp.zeros((n_pad - N, D), item_emb.dtype)])
    if quantized:
        scale_pad = item_scale if n_pad == N else jnp.concatenate(
            [item_scale, jnp.zeros(n_pad - N, item_scale.dtype)])
    bm = catalog_blockmax(user_emb, item_emb, chunk, item_block, interpret,
                          item_scale_padded=scale_pad)
    bm = jnp.where(jnp.arange(bm.shape[1])[None, :] < nb_real, bm, -jnp.inf)
    _, blk = fast_topk(bm, kp)                          # [B, kp] winning blocks
    it3 = item_emb.reshape(n_pad // chunk, chunk, D)
    cand = it3[blk]                                     # [B, kp, chunk, D] slabs
    if quantized:
        # pass-2 re-scores from the same quantized rows, so selection and
        # final scores are consistent (exact top-k of the quantized scores)
        csc = scale_pad.reshape(n_pad // chunk, chunk)[blk]   # [B, kp, chunk]
        sc = jnp.einsum("bd,bkcd->bkc", user_emb,
                        cand.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        sc = (sc * csc).reshape(B, kp * chunk)
    else:
        sc = jnp.einsum("bd,bkcd->bkc", user_emb, cand,
                        preferred_element_type=jnp.float32
                        ).reshape(B, kp * chunk)
    iid = (blk[..., None] * chunk
           + jnp.arange(chunk)).reshape(B, kp * chunk)
    v, ci = jax.lax.top_k(_mask_candidates(sc, iid), k)
    return v, jnp.take_along_axis(iid, ci, axis=-1)
