"""Pallas kernel unit tests.

Interpret mode on the CPU backend by default; with UNIREC_TEST_PLATFORM=tpu
(see conftest.py) the same suite runs against the real chip with interpret
OFF, i.e. compiled Mosaic — the recorded-evidence run VERDICT r3 asked for.

The reference has no kernels to test; these are new surface (SURVEY.md §7.8:
"kernel unit tests, new, because we now have kernels")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unirec_tpu.ops.attention as A

ON_TPU = jax.default_backend() == "tpu"
# Explicit interpret= args below: interpreted on CPU, compiled Mosaic on TPU.
INTERP = not ON_TPU

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (1-chip TPU run)")


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(A, "_INTERPRET", True)


def _inputs(B=2, H=2, L=16, D=8, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
               for _ in range(3))
    # causal + padding mask like modules.causal_attention_mask
    item_seq = rng.integers(0, 5, size=(B, L))
    item_seq[:, -4:] = rng.integers(1, 5, size=(B, 4))
    pad = (item_seq > 0).astype(np.float32)[:, None, None, :]
    causal = np.tril(np.ones((L, L), np.float32))[None, None]
    mask = jnp.asarray((1.0 - pad * causal) * A.MASK_VALUE, jnp.float32)
    return q, k, v, mask


def test_flash_matches_xla_forward():
    q, k, v, mask = _inputs()
    ref = A.xla_attention(q, k, v, mask)
    out = A.flash_attention(q, k, v, jnp.broadcast_to(mask, ref.shape[:2] + mask.shape[2:]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_matches_xla_gradients():
    q, k, v, mask = _inputs(L=8, D=8)
    maskb = jnp.broadcast_to(mask, q.shape[:2] + mask.shape[2:])

    def loss_flash(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, maskb) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_blockwise_split_invariance():
    """Larger L exercises multiple q/k blocks; result must be identical."""
    q, k, v, mask = _inputs(L=256, D=8, seed=3)
    ref = A.xla_attention(q, k, v, mask)
    out = A.flash_attention(q, k, v, jnp.broadcast_to(mask, ref.shape[:2] + mask.shape[2:]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_causal_attention_dispatch_fallback():
    """On CPU without interpret forcing, dispatch must use the XLA path."""
    q, k, v, mask = _inputs(L=10, D=7)  # tile-unfriendly shapes
    out = A.causal_attention(q, k, v, mask, use_pallas=True)
    ref = A.xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@needs_mesh
def test_sharded_catalog_topk_matches_dense():
    """Exact distributed top-k over a row-sharded catalog on the 8-device
    CPU mesh equals the single-device dense result."""
    import jax.numpy as jnp

    from unirec_tpu.core.mesh import create_mesh
    from unirec_tpu.ops.topk import place_item_table, sharded_catalog_topk

    mesh = create_mesh(data=1, model=8)
    rng = np.random.default_rng(11)
    B, N, D, K = 16, 1000, 24, 10
    users = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    dense = np.asarray(users @ items.T + bias[None, :])
    want_ids = np.argsort(-dense, axis=1)[:, :K]

    table, n_pad = place_item_table(items, mesh.mesh)
    bias_p = jnp.concatenate([bias, jnp.zeros(n_pad - N)])
    vals, ids = sharded_catalog_topk(users, table, K, mesh.mesh,
                                     item_bias=bias_p, n_real=N)
    assert (np.asarray(ids) < N).all()  # padded rows never win
    np.testing.assert_array_equal(np.sort(np.asarray(ids), axis=1),
                                  np.sort(want_ids, axis=1))
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(dense, np.asarray(ids), axis=1), rtol=1e-5)


@needs_mesh
def test_sharded_catalog_topk_fused_biasfree_matches_dense():
    """Bias-free sharded top-k takes the per-shard FUSED pass (the [B,
    n_local] score slab never hits HBM); must equal the dense result,
    including banning the zero-padded tail rows past n_real. Shapes are
    sized so the Pallas kernel path (not the small-N dense fallback) is
    exercised per shard."""
    import jax.numpy as jnp

    from unirec_tpu.core.mesh import create_mesh
    from unirec_tpu.ops.topk import place_item_table, sharded_catalog_topk

    mesh = create_mesh(data=1, model=8)
    rng = np.random.default_rng(13)
    B, N, D, K = 16, 6997, 24, 10
    users = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    # all-negative scores: zero pad rows (score 0) would win if unmasked
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    users = -jnp.abs(users)
    items = jnp.abs(items)

    dense = np.asarray(users @ items.T)
    want_ids = np.argsort(-dense, axis=1)[:, :K]

    table, n_pad = place_item_table(items, mesh.mesh)
    assert n_pad > N  # the padded-tail ban is actually exercised
    vals, ids = sharded_catalog_topk(users, table, K, mesh.mesh, n_real=N)
    assert (np.asarray(ids) < N).all()
    np.testing.assert_array_equal(np.sort(np.asarray(ids), axis=1),
                                  np.sort(want_ids, axis=1))
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(dense, np.asarray(ids), axis=1), rtol=1e-5)


def test_dice_and_sequence_att_layer():
    """DIN-building-block modules (modules.py:135-225 in the reference)."""
    import jax
    import jax.numpy as jnp

    from unirec_tpu.models.modules import Dice, SequenceAttLayer

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    dice = Dice(emb_size=8)
    vars_ = dice.init(jax.random.PRNGKey(0), x)
    out = dice.apply(vars_, x)
    # alpha starts at 0 -> Dice(s) == sigmoid(s)*s at init
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.sigmoid(x) * x), rtol=1e-6)

    B, T, L, H = 2, 3, 6, 8
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    klen = jnp.asarray([4, 6], jnp.int32)
    att = SequenceAttLayer(H, H)
    vars_ = att.init(jax.random.PRNGKey(1), q, k, klen)
    out = att.apply(vars_, q, k, klen)
    assert out.shape == (B, T, H)
    assert np.isfinite(np.asarray(out)).all()


def test_mmoe_and_modulate_hidden():
    """Parameter-generator blocks from the reference inventory
    (modules.py:623-731) — exercised even though no shipped model uses them
    (the reference's zoo doesn't either)."""
    import jax
    import jax.numpy as jnp

    from unirec_tpu.models.modules import MMoEUnit, ModulateHidden

    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    mmoe = MMoEUnit(input_size=8, output_size=6, emb_size=16, expert_num=5)
    vars_ = mmoe.init(jax.random.PRNGKey(0), z)
    patch = mmoe.apply(vars_, z)
    assert patch.shape == (4, 6, 8)

    x = jnp.asarray(rng.normal(size=(4, 3, 8)), jnp.float32)
    mod = ModulateHidden(input_size=8, emb_size=16)
    vars_ = mod.init(jax.random.PRNGKey(1), x, z)
    out = mod.apply(vars_, x, z)
    assert out.shape == (4, 3, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_load_xlearn_fm(tmp_path):
    """xlearn text-checkpoint import (reference fm.py:133-152 format)."""
    import os

    from unirec_tpu.models.rank import load_xlearn_fm
    n_feats, d = 5, 3
    lines = ["bias: 0.25"]
    lines += [f"i_{i}: {0.1 * i}" for i in range(n_feats)]
    lines += [f"v_{i}: " + " ".join(str(0.01 * (i + j)) for j in range(d))
              for i in range(n_feats)]
    p = os.path.join(str(tmp_path), "fm.txt")
    open(p, "w").write("\n".join(lines))
    params = load_xlearn_fm(p, n_feats, d)
    assert params["fm_linear_bias"][0] == 0.25
    assert params["fm_linear_weight"].shape == (n_feats,)
    assert params["fm_embedding"]["embedding"].shape == (n_feats, d)
    np.testing.assert_allclose(params["fm_linear_weight"][2], 0.2)


def test_flash_backward_multiblock():
    """Gradients across multiple q/k blocks (L=256) match XLA."""
    q, k, v, mask = _inputs(L=256, D=8, seed=9)
    maskb = jnp.broadcast_to(mask, q.shape[:2] + mask.shape[2:])

    def loss_flash(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, maskb) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


# ------------------------------------------------------- fused short-seq
@pytest.mark.parametrize("L", [16, 50])     # 50: needs sublane padding
@pytest.mark.parametrize("B", [4, 6])       # 6: odd block-rows fallback
def test_fused_attention_forward_matches_xla(B, L):
    q, k, v, mask = _inputs(B=B, L=L)
    ref = A.xla_attention(q, k, v, mask)
    out = A.short_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grads_match_xla():
    q, k, v, mask = _inputs(B=4, L=50)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, mask, 0.0, seed) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"d{n}")


def test_fused_attention_per_head_mask():
    q, k, v, mask = _inputs(B=4, L=16)
    mask_h = jnp.broadcast_to(mask, (4, 2, 16, 16))
    ref = A.xla_attention(q, k, v, mask_h)
    out = A.short_attention(q, k, v, mask_h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(ON_TPU, reason="tests the CPU fallback dropout semantics;"
                    " on TPU the pltpu PRNG path draws a different mask")
def test_short_attention_dropout_fallback_on_cpu():
    """With dropout active the interpret path can't run pltpu PRNG; the
    wrapper must fall back to the XLA path with flax-style dropout."""
    q, k, v, mask = _inputs(B=4, L=16)
    rng = jax.random.PRNGKey(0)
    out = A.short_attention(q, k, v, mask, p_drop=0.5, dropout_rng=rng,
                            train=True)
    ref_probs = A.xla_attention_probs(q, k, mask)
    keep = jax.random.bernoulli(rng, 0.5, ref_probs.shape)
    ref = jnp.einsum("bhqk,bhkd->bhqd",
                     jnp.where(keep, ref_probs / 0.5, 0.0), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------- sorted-grad embedding
def test_sorted_grad_gather_matches_plain():
    from unirec_tpu.ops.embedding import gather

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 50, size=(6, 9)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(6, 9, 8)), jnp.float32)

    out = gather(table, ids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))

    def loss_custom(t):
        return jnp.vdot(gather(t, ids), g)

    def loss_plain(t):
        return jnp.vdot(t[ids], g)

    gc = jax.grad(loss_custom)(table)
    gp = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), atol=1e-5)


def test_expand_grad_gather_matches_plain():
    from unirec_tpu.ops.embedding import gather_expand

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    # heavy duplication on purpose: the expand path exists for colliding ids
    ids = jnp.asarray(rng.integers(0, 10, size=(6, 9)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(6, 9, 8)), jnp.float32)

    for k in (2, 8):
        out = gather_expand(table, ids, k)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))

        gc = jax.grad(lambda t: jnp.vdot(gather_expand(t, ids, k), g))(table)
        gp = jax.grad(lambda t: jnp.vdot(t[ids], g))(table)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), atol=1e-5)


def test_expand_grad_model_trains():
    model, params, batch = _tiny_sasrec("bfloat16",
                                        expand_embedding_grad=8)
    model_p, params_p, _ = _tiny_sasrec("bfloat16")

    def loss_fn(m, p):
        loss, _ = m.apply(p, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return loss

    ge = jax.grad(lambda p: loss_fn(model, p))(params)["params"]
    gp = jax.grad(lambda p: loss_fn(model_p, p))(params_p)["params"]
    np.testing.assert_allclose(
        np.asarray(ge["item_embedding"]["embedding"], np.float32),
        np.asarray(gp["item_embedding"]["embedding"], np.float32),
        atol=2e-2)


def _tiny_sasrec(compute_dtype, **extra):
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": 50, "n_items": 80, "max_seq_len": 10,
        "embedding_size": 16, "hidden_size": 16, "inner_size": 32,
        "n_layers": 1, "n_heads": 2, "loss_type": "bce", "group_size": -1,
        "dataloader": "SeqRecDataset", "n_sample_neg_train": 2,
        "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
        "compute_dtype": compute_dtype, "use_pallas": 0, **extra}, argv=[])
    model = get_model_class("SASRec")(cfg=cfg)
    rng = np.random.default_rng(0)
    batch = {
        "user_id": jnp.asarray(rng.integers(1, 50, 8), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 80, (8, 3)), jnp.int32),
        "label": jnp.asarray(
            np.concatenate([np.ones((8, 1)), np.zeros((8, 2))], 1),
            jnp.float32),
        "item_seq": jnp.asarray(rng.integers(0, 80, (8, 10)), jnp.int32),
        "item_seq_len": jnp.asarray(rng.integers(1, 10, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch,
                        train=False)
    return model, params, batch


def test_bf16_attention_core_stays_bf16():
    """Regression: the additive attention mask must not upcast the
    [B, H, L, L] score/softmax/dropout chain back to f32 — that silently
    doubled the HBM traffic of the dominant bench-step tensors (the mask
    is built in f32 by causal_attention_mask and added to bf16 scores)."""
    model, params, batch = _tiny_sasrec("bfloat16")

    def fwd(p):
        loss, _ = model.apply(p, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
        return loss

    hlo = jax.jit(fwd).lower(params).as_text()
    # L=10 heads=2 B=8: any 8x2x10x10 tensor is the attention core.
    # The RNG's elementwise internals and softmax's f32 accumulator fuse
    # away; the ops that MATERIALIZE [B,H,L,L] are the score add, the
    # softmax divide, the dropout select and the two dot_generals — none
    # may produce f32.
    assert "tensor<8x2x10x10xbf16>" in hlo
    main = hlo.split("func.func private", 1)[0]  # RNG helpers fuse away
    for op in ("dot_general", "divide", "select", "add"):
        for line in main.splitlines():
            if f"stablehlo.{op}" in line and \
                    line.strip().startswith("%") and \
                    line.rstrip().endswith("tensor<8x2x10x10xf32>"):
                raise AssertionError(f"f32 attention-core op: {line.strip()}")


def test_bf16_forward_close_to_f32():
    model32, params, batch = _tiny_sasrec("float32")
    model16, _, _ = _tiny_sasrec("bfloat16")
    l32, _ = model32.apply(params, batch, train=False)
    l16, _ = model16.apply(params, batch, train=False)
    np.testing.assert_allclose(float(l32), float(l16), rtol=2e-2)


def test_rbg_dropout_key_trains():
    """dropout_rng_impl=rbg wraps the step rng onto the hardware RNG path;
    flax dropout must accept the typed key and produce a finite loss."""
    model, params, batch = _tiny_sasrec("float32")
    k = jax.random.wrap_key_data(
        jax.random.bits(jax.random.PRNGKey(3), (4,), jnp.uint32), impl="rbg")
    loss, _ = model.apply(params, batch, train=True, rngs={"dropout": k})
    assert np.isfinite(float(loss))


def test_direct_attention_layout_matches_default():
    """attn_direct_layout=1 keeps q/k/v in [B, L, H, d]; contractions are
    identical, so eval outputs must match the transpose formulation."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    base = {
        "model": "SASRec", "n_users": 50, "n_items": 80, "max_seq_len": 10,
        "embedding_size": 16, "hidden_size": 16, "inner_size": 32,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce", "group_size": -1,
        "dataloader": "SeqRecDataset", "n_sample_neg_train": 2,
        "use_pallas": 0}
    m0 = get_model_class("SASRec")(cfg=config_mod.parse_arguments(dict(base), argv=[]))
    m1 = get_model_class("SASRec")(
        cfg=config_mod.parse_arguments(dict(base, attn_direct_layout=1), argv=[]))
    rng = np.random.default_rng(1)
    batch = {
        "user_id": jnp.asarray(rng.integers(1, 50, 8), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 80, (8, 3)), jnp.int32),
        "label": jnp.asarray(
            np.concatenate([np.ones((8, 1)), np.zeros((8, 2))], 1),
            jnp.float32),
        "item_seq": jnp.asarray(rng.integers(0, 80, (8, 10)), jnp.int32),
        "item_seq_len": jnp.asarray(rng.integers(1, 10, 8), jnp.int32),
    }
    params = m0.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    l0, _ = m0.apply(params, batch, train=False)
    l1, _ = m1.apply(params, batch, train=False)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


def test_remat_attention_matches_default():
    """remat_attention=1 must be numerically identical (same ops, same RNG
    replay) in loss AND gradients — it only changes what autodiff stores."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    base = {
        "model": "SASRec", "n_users": 50, "n_items": 80, "max_seq_len": 10,
        "embedding_size": 16, "hidden_size": 16, "inner_size": 32,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce", "group_size": -1,
        "dataloader": "SeqRecDataset", "n_sample_neg_train": 2,
        # pin f32: the numerically-identical claim is per-dtype (the TPU
        # bf16 default reorders fused rounding between the two programs)
        "use_pallas": 0, "compute_dtype": "float32"}
    m0 = get_model_class("SASRec")(cfg=config_mod.parse_arguments(dict(base), argv=[]))
    m1 = get_model_class("SASRec")(
        cfg=config_mod.parse_arguments(dict(base, remat_attention=1), argv=[]))
    rng = np.random.default_rng(2)
    batch = {
        "user_id": jnp.asarray(rng.integers(1, 50, 8), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 80, (8, 3)), jnp.int32),
        "label": jnp.asarray(
            np.concatenate([np.ones((8, 1)), np.zeros((8, 2))], 1),
            jnp.float32),
        "item_seq": jnp.asarray(rng.integers(0, 80, (8, 10)), jnp.int32),
        "item_seq_len": jnp.asarray(rng.integers(1, 10, 8), jnp.int32),
    }
    params = m0.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, batch, train=False)

    def loss_fn(model):
        def f(p):
            loss, _ = model.apply(p, batch, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(5)})
            return loss
        return f

    l0, g0 = jax.value_and_grad(loss_fn(m0))(params)
    l1, g1 = jax.value_and_grad(loss_fn(m1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_bf16_embedding_gather_emits_bf16():
    """Regression: with compute_dtype=bfloat16 the item_seq embedding gather
    must be cast at the gather site — an f32 [B*L, d] gather output (and the
    f32 reshape/copy chain behind it) measured ~15 ms/step of avoidable HBM
    traffic at bench shapes, and the backward scatter read f32 updates."""
    model, params, batch = _tiny_sasrec("bfloat16")

    # the gathered sequence embedding (and everything it is added to —
    # position/time/features embeddings) must come out bf16 so the gather
    # fusion writes bf16 and no downstream add re-promotes to f32
    emb = model.apply(params, batch["item_seq"],
                      method=lambda m, s: m.item_embedding_for_user(s))
    assert emb.dtype == jnp.bfloat16

    # and the f32 model keeps f32 (the cast must be a no-op there)
    model32, params32, _ = _tiny_sasrec("float32")
    emb32 = model32.apply(params32, batch["item_seq"],
                          method=lambda m, s: m.item_embedding_for_user(s))
    assert emb32.dtype == jnp.float32

    # loss parity with the f32 path stays within bf16 tolerance
    l16, _ = model.apply(params, batch, train=False)
    l32, _ = model32.apply(params32, batch, train=False)
    np.testing.assert_allclose(float(l16), float(l32), rtol=3e-2)


def test_dropout8_statistics_and_scale():
    """Dropout8 keeps with probability 1 - round(rate*256)/256 and rescales
    by the realized probability, so the conditional kept-value scale is
    exact and the keep fraction matches the quantized rate."""
    from unirec_tpu.models.modules import Dropout8

    x = jnp.ones((512, 257), jnp.float32)
    d = Dropout8(0.1)
    y = d.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    kept = np.asarray(y) != 0.0
    thr = round(0.1 * 256)
    keep_p = 1.0 - thr / 256.0
    assert abs(kept.mean() - keep_p) < 0.01
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / keep_p, rtol=1e-6)
    # deterministic=True and rate 0 are identity
    assert (np.asarray(d.apply({}, x, True,
                               rngs={"dropout": jax.random.PRNGKey(0)})) == 1.0).all()
    z = Dropout8(0.0).apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    assert (np.asarray(z) == 1.0).all()


def test_dropout8_model_trains():
    """dropout_bits=8 must leave the param tree unchanged and train."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    base = {
        "model": "SASRec", "n_users": 50, "n_items": 80, "max_seq_len": 10,
        "embedding_size": 16, "hidden_size": 16, "inner_size": 32,
        "n_layers": 1, "n_heads": 2, "loss_type": "bce", "group_size": -1,
        "dataloader": "SeqRecDataset", "n_sample_neg_train": 2,
        "hidden_dropout_prob": 0.2, "attn_dropout_prob": 0.2, "use_pallas": 0}
    m0 = get_model_class("SASRec")(cfg=config_mod.parse_arguments(dict(base), argv=[]))
    m8 = get_model_class("SASRec")(
        cfg=config_mod.parse_arguments(dict(base, dropout_bits=8), argv=[]))
    rng = np.random.default_rng(3)
    batch = {
        "user_id": jnp.asarray(rng.integers(1, 50, 8), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 80, (8, 3)), jnp.int32),
        "label": jnp.asarray(
            np.concatenate([np.ones((8, 1)), np.zeros((8, 2))], 1),
            jnp.float32),
        "item_seq": jnp.asarray(rng.integers(0, 80, (8, 10)), jnp.int32),
        "item_seq_len": jnp.asarray(rng.integers(1, 10, 8), jnp.int32),
    }
    p0 = m0.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    p8 = m8.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p8)
    loss, _ = m8.apply(p8, batch, train=True,
                       rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(float(loss))
    # eval path identical (dropout off)
    l0, _ = m0.apply(p0, batch, train=False)
    l8, _ = m8.apply(p8, batch, train=False)
    np.testing.assert_allclose(float(l0), float(l8), rtol=1e-6)


def test_fused_attention_bf16_inputs_match_f32():
    """bf16 q/k/v run the kernel's bf16-matmul path (f32 accumulate + f32
    softmax); outputs and grads must track the f32 XLA reference within
    bf16 rounding."""
    q, k, v, mask = _inputs(B=4, L=50)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    maskb = mask.astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    ref = A.xla_attention(q, k, v, mask)
    out = A.fused_attention(qb, kb, vb, maskb, 0.0, seed)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.03, rtol=0.03)

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, maskb, 0.0, seed)
                       .astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qb, kb, vb)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   atol=0.15, rtol=0.1, err_msg=f"d{n}")


def test_qkv_packed_matches_unpacked():
    """qkv_packed=1 computes identical outputs to the three separate
    projections once the packed kernel is the concatenation of the three
    unpacked kernels (same contractions, one matmul)."""
    from unirec_tpu.models.modules import MultiHeadAttention, causal_attention_mask

    B, L, H = 4, 10, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    seq = jnp.asarray(rng.integers(1, 50, (B, L)), jnp.int32)
    mask = causal_attention_mask(seq)

    unpacked = MultiHeadAttention(2, H, 0.0, 0.0, 1e-12)
    packed = MultiHeadAttention(2, H, 0.0, 0.0, 1e-12, qkv_packed=True)
    pu = unpacked.init({"params": jax.random.PRNGKey(0)}, x, mask, False)
    pp = jax.tree_util.tree_map(lambda a: np.array(a),
                                packed.init({"params": jax.random.PRNGKey(0)},
                                            x, mask, False))
    u = pu["params"]
    pp["params"]["qkv"]["kernel"] = np.concatenate(
        [np.asarray(u[n]["kernel"]) for n in ("query", "key", "value")], axis=1)
    pp["params"]["qkv"]["bias"] = np.concatenate(
        [np.asarray(u[n]["bias"]) for n in ("query", "key", "value")])

    yu = unpacked.apply(pu, x, mask, False)
    yp = packed.apply(pp, x, mask, False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu),
                               atol=1e-5, rtol=1e-5)


def test_last_query_matches_full_final_row():
    """last_query=True computes the same math as slicing row L-1 of the full
    attention output (modulo XLA reduction-order float noise); shapes become
    [B, 1, H]. Also checked through a full SASRec tower via last_query_only."""
    from unirec_tpu.models.modules import MultiHeadAttention, causal_attention_mask

    B, L, H = 4, 10, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    seq = np.zeros((B, L), np.int32)
    for i in range(B):  # left-padded, variable lengths
        n = int(rng.integers(2, L))
        seq[i, L - n:] = rng.integers(1, 50, n)
    mask = causal_attention_mask(jnp.asarray(seq))

    full = MultiHeadAttention(2, H, 0.0, 0.0, 1e-12)
    lastq = MultiHeadAttention(2, H, 0.0, 0.0, 1e-12, last_query=True)
    p = full.init({"params": jax.random.PRNGKey(0)}, x, mask, False)
    yf = full.apply(p, x, mask, False)
    yl = lastq.apply(p, x, mask, False)  # same param structure
    assert yl.shape == (B, 1, H)
    np.testing.assert_allclose(np.asarray(yl[:, 0]), np.asarray(yf[:, -1]),
                               atol=1e-5, rtol=1e-5)


def test_sasrec_last_query_only_matches_full():
    """SASRec with last_query_only=1 (opt-in, used by the headline bench)
    produces the same eval user embedding as the full-path encoder, and
    trains (finite loss)."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    def build(lq):
        cfg = config_mod.parse_arguments({
            "model": "SASRec", "n_users": 50, "n_items": 200,
            "max_seq_len": 10, "embedding_size": 16, "hidden_size": 16,
            "inner_size": 32, "n_layers": 2, "n_heads": 2, "loss_type": "bce",
            "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
            "dataloader": "SeqRecDataset", "last_query_only": lq,
        }, argv=[])
        return get_model_class("SASRec")(cfg=cfg)

    rng = np.random.default_rng(0)
    seq = np.zeros((4, 10), np.int32)
    for i in range(4):
        n = int(rng.integers(2, 10))
        seq[i, 10 - n:] = rng.integers(1, 200, n)
    seq = jnp.asarray(seq)
    batch = {"item_seq": seq, "item_id": jnp.ones((4,), jnp.int32),
             "label": jnp.ones((4,), jnp.float32)}

    m1, m0 = build(1), build(0)
    v = m1.init(jax.random.PRNGKey(0), batch, train=False)
    u1 = m1.apply(v, item_seq=seq, method=m1.forward_user_emb)
    u0 = m0.apply(v, item_seq=seq, method=m0.forward_user_emb)
    assert u1.shape == u0.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               atol=1e-4, rtol=1e-4)
    loss, _ = m1.apply(v, batch, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))


def test_head_stacked_matches_per_head():
    """head_stacked computes identical attention math to the per-head path
    (same params), for multiple head counts, full and last-query."""
    from unirec_tpu.models.modules import MultiHeadAttention, causal_attention_mask

    B, L, H = 4, 10, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    seq = np.zeros((B, L), np.int32)
    for i in range(B):
        n = int(rng.integers(2, L))
        seq[i, L - n:] = rng.integers(1, 50, n)
    mask = causal_attention_mask(jnp.asarray(seq))

    for nh in (2, 4):
        full = MultiHeadAttention(nh, H, 0.0, 0.0, 1e-12)
        stacked = MultiHeadAttention(nh, H, 0.0, 0.0, 1e-12, head_stacked=True)
        p = full.init({"params": jax.random.PRNGKey(0)}, x, mask, False)
        yf = full.apply(p, x, mask, False)
        ys = stacked.apply(p, x, mask, False)  # same param structure
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yf),
                                   atol=1e-5, rtol=1e-5)
        both = MultiHeadAttention(nh, H, 0.0, 0.0, 1e-12, head_stacked=True,
                                  last_query=True)
        yb = both.apply(p, x, mask, False)
        assert yb.shape == (B, 1, H)
        np.testing.assert_allclose(np.asarray(yb[:, 0]), np.asarray(yf[:, -1]),
                                   atol=1e-5, rtol=1e-5)


def test_sasrec_head_stacked_matches_full():
    """SASRec with attn_head_stacked=1 (+ last_query_only) produces the same
    eval user embedding as the default encoder and trains (finite loss, grads
    flow to the embedding table)."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    def build(**kw):
        cfg = config_mod.parse_arguments({
            "model": "SASRec", "n_users": 50, "n_items": 200,
            "max_seq_len": 10, "embedding_size": 16, "hidden_size": 16,
            "inner_size": 32, "n_layers": 2, "n_heads": 2, "loss_type": "bce",
            "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
            "dataloader": "SeqRecDataset", **kw,
        }, argv=[])
        return get_model_class("SASRec")(cfg=cfg)

    rng = np.random.default_rng(0)
    seq = np.zeros((4, 10), np.int32)
    for i in range(4):
        n = int(rng.integers(2, 10))
        seq[i, 10 - n:] = rng.integers(1, 200, n)
    seq = jnp.asarray(seq)
    batch = {"item_seq": seq, "item_id": jnp.ones((4,), jnp.int32),
             "label": jnp.ones((4,), jnp.float32)}

    m0 = build()
    v = m0.init(jax.random.PRNGKey(0), batch, train=False)
    u0 = m0.apply(v, item_seq=seq, method=m0.forward_user_emb)
    for kw in ({"attn_head_stacked": 1},
               {"attn_head_stacked": 1, "last_query_only": 1}):
        m1 = build(**kw)
        u1 = m1.apply(v, item_seq=seq, method=m1.forward_user_emb)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                                   atol=1e-4, rtol=1e-4)
        def loss_fn(params):
            loss, _ = m1.apply({"params": params}, batch, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)})
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        g = grads["item_embedding"]["embedding"]
        assert float(jnp.abs(g).sum()) > 0


def test_gather_cast_grad_matches_default():
    """gather_cast (f32 backward scatter) forward == bf16-table gather;
    backward == scatter of the bf16 grads converted to f32."""
    from unirec_tpu.ops.embedding import gather_cast

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(30, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 30, size=(6, 5)), jnp.int32)

    def f_new(t):
        return (gather_cast(t, ids, jnp.bfloat16).astype(jnp.float32) ** 2).sum()

    def f_ref(t):
        return (t.astype(jnp.bfloat16)[ids].astype(jnp.float32) ** 2).sum()

    y_new, g_new = jax.value_and_grad(f_new)(table)
    y_ref, g_ref = jax.value_and_grad(f_ref)(table)
    np.testing.assert_allclose(float(y_new), float(y_ref), rtol=1e-6)
    # reference grad scatters bf16 then converts; ours scatters f32 —
    # identical additions up to the bf16 rounding of the combine
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-2, rtol=1e-2)


def test_fast_topk_certified_exact():
    """fast_topk's block-max selection (ops/topk.py: gather the k blocks
    with the largest maxima, sort the k*chunk survivors) returns exactly
    lax.top_k's values — including under heavy ties at the k-th value —
    and identical ids when untied."""
    from unirec_tpu.ops.topk import fast_topk

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 70_000)), jnp.float32)
    v, i = jax.jit(lambda a: fast_topk(a, 50))(x)
    vr, ir = jax.lax.top_k(x, 50)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))

    # plant 5000 copies of the boundary value: values must stay exact
    # (tie ORDER at the boundary is unspecified on the fast path)
    tie = float(np.asarray(vr)[2, 49])
    xt = jnp.concatenate(
        [x, jnp.full((6, 5000), tie, jnp.float32)], axis=1)
    v2, _ = jax.jit(lambda a: fast_topk(a, 50))(xt)
    np.testing.assert_array_equal(np.asarray(v2),
                                  np.asarray(jax.lax.top_k(xt, 50)[0]))

    # small-N path falls back to the plain sort
    v3, i3 = fast_topk(x[:, :300], 50)
    np.testing.assert_array_equal(np.asarray(v3),
                                  np.asarray(jax.lax.top_k(x[:, :300], 50)[0]))

    # adversarial concentration: ALL true top-k inside one block — the
    # winning block's gather must recover every one of them
    xc = np.asarray(x).copy()
    xc[:, 1000:1050] = 100.0 + np.arange(50, dtype=np.float32)
    v4, i4 = jax.jit(lambda a: fast_topk(a, 50))(jnp.asarray(xc))
    vr4, ir4 = jax.lax.top_k(jnp.asarray(xc), 50)
    np.testing.assert_array_equal(np.asarray(v4), np.asarray(vr4))
    np.testing.assert_array_equal(np.asarray(i4), np.asarray(ir4))


def test_fused_catalog_topk_exact():
    """fused_catalog_topk (Pallas blockmax + two-pass re-score, ops/topk.py)
    returns exactly the ids of lax.top_k over the dense scores, on the
    interpret path (CPU), including: catalog not a multiple of chunk or
    item_block, all-negative scores (so the zero-padded catalog rows would
    win if not masked), history exclusion with a kept target, and pad-item
    exclusion."""
    from unirec_tpu.ops.topk import fused_catalog_topk

    rng = np.random.default_rng(3)
    B, N, D, K = 12, 5003, 16, 10
    users = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)

    def dense(u, it):
        return jax.lax.dot_general(u, it, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    v, i = fused_catalog_topk(users, items, K, item_block=256,
                              interpret=INTERP)
    vr, ir = jax.lax.top_k(dense(users, items), K)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr), rtol=1e-6)

    # all-negative scores: every zero-padded catalog row (score 0) would
    # outrank every real item unless masked
    users_neg = -jnp.abs(users) - 1.0
    items_pos = jnp.abs(items) + 1.0     # scores strictly negative
    v2, i2 = fused_catalog_topk(users_neg, items_pos, K, item_block=256,
                                interpret=INTERP)
    vr2, ir2 = jax.lax.top_k(dense(users_neg, items_pos), K)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir2))
    assert float(np.asarray(v2).max()) < 0.0

    # history exclusion + kept target + pad-item exclusion vs the dense
    # masked reference (reference reco_topk.py:81-85 semantics)
    hcap = 7
    hist = rng.integers(1, N, size=(B, hcap)).astype(np.int32)
    hlen = rng.integers(0, hcap + 1, size=(B,)).astype(np.int32)
    keep = hist[np.arange(B), np.maximum(hlen - 1, 0)].astype(np.int32)
    v3, i3 = fused_catalog_topk(
        users, items, K, item_block=256, interpret=INTERP,
        hist_items=jnp.asarray(hist), hist_len=jnp.asarray(hlen),
        keep_ids=jnp.asarray(keep), exclude_pad_item=True)
    sc = np.asarray(dense(users, items)).copy()
    for b in range(B):
        banned = set(hist[b, :hlen[b]].tolist()) - {int(keep[b])}
        banned.add(0)
        sc[b, list(banned)] = -np.inf
    vr3, ir3 = jax.lax.top_k(jnp.asarray(sc), K)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(ir3))

    # adversarial concentration: the whole true top-k inside one block
    itc = np.asarray(items).copy()
    itc[300:300 + K] = 50.0 * np.asarray(users[5] /
                                         np.linalg.norm(users[5]))
    v4, i4 = fused_catalog_topk(users, jnp.asarray(itc), K,
                                item_block=256, interpret=INTERP)
    vr4, ir4 = jax.lax.top_k(dense(users, jnp.asarray(itc)), K)
    np.testing.assert_array_equal(np.asarray(i4), np.asarray(ir4))


def test_fused_ffn_matches_reference():
    """Pallas fused dense->act->dense (ops/ffn.py) matches the XLA reference
    forward and in all five gradients, for every supported activation, with
    a token count that is not a multiple of the block (exercises padding)."""
    from unirec_tpu.ops.ffn import fused_ffn, ffn_reference

    rng = np.random.default_rng(0)
    T, D, F = 37, 16, 64
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)

    for act in ("relu", "swish", "sigmoid", "tanh", "gelu", "leakyrelu"):
        y = fused_ffn(x, w1, b1, w2, b2, act, 16, True)
        yr = ffn_reference(x, w1, b1, w2, b2, act)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   atol=1e-5, rtol=1e-5)
        f = lambda *a: jnp.vdot(fused_ffn(*a, act, 16, True), dy)
        fr = lambda *a: jnp.vdot(ffn_reference(*a, act), dy)
        g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_fused_ffn_bf16_close_to_f32():
    """bf16 operands: fused kernel stays close to the f32 XLA reference
    (both use f32 accumulation)."""
    from unirec_tpu.ops.ffn import fused_ffn, ffn_reference

    rng = np.random.default_rng(1)
    T, D, F = 24, 16, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
    x, w1, b1, w2, b2 = mk(T, D), mk(D, F), mk(F), mk(F, D), mk(D)
    y = fused_ffn(x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                  b1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                  b2.astype(jnp.bfloat16), "gelu", 8, True)
    yr = ffn_reference(x, w1, b1, w2, b2, "gelu")
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(yr),
                               atol=0.05, rtol=0.05)


def test_sasrec_fused_ffn_matches_full():
    """SASRec with use_fused_ffn=1 keeps the identical param tree, produces
    the same eval user embedding as the default encoder, and trains (finite
    loss, grads flow to the FFN kernels)."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    def build(**kw):
        cfg = config_mod.parse_arguments({
            "model": "SASRec", "n_users": 50, "n_items": 200,
            "max_seq_len": 10, "embedding_size": 16, "hidden_size": 16,
            "inner_size": 32, "n_layers": 2, "n_heads": 2, "loss_type": "bce",
            "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
            # f32 even on TPU (bf16 default): the 1e-4 fused-vs-unfused
            # comparison below is an f32-precision claim
            "compute_dtype": "float32",
            "dataloader": "SeqRecDataset", **kw,
        }, argv=[])
        return get_model_class("SASRec")(cfg=cfg)

    rng = np.random.default_rng(0)
    seq = np.zeros((4, 10), np.int32)
    for i in range(4):
        n = int(rng.integers(2, 10))
        seq[i, 10 - n:] = rng.integers(1, 200, n)
    seq = jnp.asarray(seq)
    batch = {"item_seq": seq, "item_id": jnp.ones((4,), jnp.int32),
             "label": jnp.ones((4,), jnp.float32)}

    m0, m1 = build(), build(use_fused_ffn=1)
    v = m0.init(jax.random.PRNGKey(0), batch, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), batch, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    u0 = m0.apply(v, item_seq=seq, method=m0.forward_user_emb)
    u1 = m1.apply(v, item_seq=seq, method=m1.forward_user_emb)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               atol=1e-4, rtol=1e-4)

    def loss_fn(params):
        loss, _ = m1.apply({"params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss))
    g = grads["trm_encoder"]["layer_0"]["feed_forward"]["dense_1"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_fused_catalog_topk_int8_exact_on_quantized_scores():
    """The int8 catalog path (quantize_catalog + fused_catalog_topk with
    item_scale) must return exactly lax.top_k of the DEQUANTIZED dense
    scores — i.e. the selection is exact with respect to the quantized
    catalog; only the quantization itself is approximate. Runs the Pallas
    kernel in interpret mode on CPU, including the masked/history cases
    and the dense small-N fallback."""
    from unirec_tpu.ops.topk import fused_catalog_topk, quantize_catalog

    rng = np.random.default_rng(11)
    B, N, D, K = 8, 4099, 16, 10
    users = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    q, scale = quantize_catalog(items)
    assert q.dtype == jnp.int8 and scale.shape == (N,)

    deq = q.astype(jnp.float32) * scale[:, None]
    dense = jax.lax.dot_general(users.astype(jnp.float32), deq,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    v, i = fused_catalog_topk(users, q, K, item_block=256, interpret=INTERP,
                              item_scale=scale)
    vr, ir = jax.lax.top_k(dense, K)
    if ON_TPU:
        # quantized scores carry many near-ties, and the kernel (bf16 user x
        # int8 rows, f32 acc) and the dequantized-f32 reference round them
        # differently on real hardware — selection quality is what's exact:
        # every picked item's true score must match the reference's pick
        picked = np.take_along_axis(np.asarray(dense), np.asarray(i), axis=1)
        np.testing.assert_allclose(picked, np.asarray(vr), rtol=2e-2,
                                   atol=2e-3)
    else:
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr),
                               rtol=2e-2, atol=2e-3)

    # quantization error is bounded: per-element |deq - orig| <= scale/2
    err = np.abs(np.asarray(deq) - np.asarray(items))
    assert (err <= np.asarray(scale)[:, None] * 0.5 + 1e-6).all()

    # history exclusion still guarantees no banned item surfaces
    hist = jnp.asarray(rng.integers(1, N, size=(B, 7)).astype(np.int32))
    hlen = jnp.full((B,), 7, jnp.int32)
    _, ih = fused_catalog_topk(users, q, K, item_block=256, interpret=INTERP,
                               item_scale=scale, hist_items=hist,
                               hist_len=hlen, exclude_pad_item=True)
    ih = np.asarray(ih)
    for b in range(B):
        assert not (set(ih[b].tolist()) & set(np.asarray(hist[b]).tolist()))
        assert 0 not in ih[b]

    # small-N dense fallback with quantization
    v3, i3 = fused_catalog_topk(users, q[:200], K, interpret=INTERP,
                                item_scale=scale[:200])
    vr3, ir3 = jax.lax.top_k(dense[:, :200], K)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(ir3))


def test_int8_catalog_ranking_recall_on_structured_factors():
    """Sanity: on low-rank structured factors (the trained-model score
    shape), int8 per-row quantization keeps top-k ranking recall high vs
    the full-precision catalog. The TPU-shape measurement lives in
    bench/probe_int8_recall.py; this pins the mechanism at test scale."""
    from unirec_tpu.ops.topk import fused_catalog_topk, quantize_catalog

    rng = np.random.default_rng(5)
    B, N, D, K, P = 16, 8192, 32, 20, 8
    proto = rng.normal(size=(P, D))
    users = jnp.asarray(proto[rng.integers(0, P, B)]
                        + 0.5 * rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(proto[rng.integers(0, P, N)]
                        + 0.5 * rng.normal(size=(N, D)), jnp.float32)
    q, scale = quantize_catalog(items)
    _, exact = jax.lax.top_k(
        jax.lax.dot_general(users, items, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32), K)
    _, approx = fused_catalog_topk(users, q, K, item_block=256,
                                   interpret=INTERP, item_scale=scale)
    recalls = [len(set(np.asarray(approx[b]).tolist())
                   & set(np.asarray(exact[b]).tolist())) / K
               for b in range(B)]
    assert np.mean(recalls) >= 0.9, recalls


def test_dropout_mask_remat_bit_identical():
    """dropout_mask_remat=1 regenerates the byte mask in backward from the
    rng key (modules._byte_mask_dropout custom VJP) instead of storing it —
    same key -> same bits -> same mask, so the loss is bit-identical and
    gradients match to float reassociation (the custom VJP changes how XLA
    fuses the multiply, not the math)."""
    from unirec_tpu import config as config_mod
    from unirec_tpu.utils.registry import get_model_class

    base = {
        "model": "SASRec", "n_users": 50, "n_items": 80, "max_seq_len": 10,
        "embedding_size": 16, "hidden_size": 16, "inner_size": 32,
        "n_layers": 2, "n_heads": 2, "loss_type": "bce", "group_size": -1,
        "dataloader": "SeqRecDataset", "n_sample_neg_train": 2,
        "use_pallas": 0, "dropout_bits": 8,
        # pin f32 so the bit-identity claim holds on TPU too (the TPU
        # default is bf16, where reassociation noise breaks exact equality)
        "compute_dtype": "float32",
        "hidden_dropout_prob": 0.3, "attn_dropout_prob": 0.2}
    m0 = get_model_class("SASRec")(
        cfg=config_mod.parse_arguments(dict(base), argv=[]))
    m1 = get_model_class("SASRec")(
        cfg=config_mod.parse_arguments(dict(base, dropout_mask_remat=1),
                                       argv=[]))
    rng = np.random.default_rng(3)
    batch = {
        "user_id": jnp.asarray(rng.integers(1, 50, 8), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 80, (8, 3)), jnp.int32),
        "label": jnp.asarray(
            np.concatenate([np.ones((8, 1)), np.zeros((8, 2))], 1),
            jnp.float32),
        "item_seq": jnp.asarray(rng.integers(0, 80, (8, 10)), jnp.int32),
        "item_seq_len": jnp.asarray(rng.integers(1, 10, 8), jnp.int32),
    }
    params = m0.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, batch, train=False)

    def loss_fn(model):
        def f(p):
            loss, _ = model.apply(p, batch, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(5)})
            return loss
        return f

    l0, g0 = jax.jit(jax.value_and_grad(loss_fn(m0)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_fn(m1)))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


# ------------------------------------------------------- whole-layer kernel
def _fused_layer_setup(L=10, D=16, nh=2, F=32, B=4, act="swish",
                       causal=True, seed=0):
    import unirec_tpu.ops.layer as LY
    from unirec_tpu.models import modules

    if not ON_TPU:
        LY._INTERPRET = True
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1  # at least 3 real positions per row
    mask = modules.causal_attention_mask(jnp.asarray(item_seq),
                                         bidirectional=not causal)
    ref = modules.TransformerLayer(nh, D, F, 0.0, 0.0, act, 1e-12)
    fused = modules.TransformerLayer(nh, D, F, 0.0, 0.0, act, 1e-12,
                                     fused_layer=True, fused_causal=causal)
    variables = ref.init(jax.random.PRNGKey(0), x, mask, False)
    return ref, fused, variables, x, mask


@pytest.mark.parametrize("act,causal,L", [
    ("swish", True, 10),   # Lp padding path (10 -> 16)
    ("gelu", True, 16),
    ("relu", False, 8),    # bidirectional mask
])
def test_fused_layer_forward_matches_unfused(act, causal, L):
    """ops/layer.py whole-layer kernel == the unfused flax TransformerLayer
    in eval mode (identical param tree, same masking semantics incl. the
    reference's soft -1e4 fully-masked-row behavior)."""
    ref, fused, variables, x, mask = _fused_layer_setup(L=L, act=act,
                                                        causal=causal)
    # param trees must be interchangeable between the two paths
    vf = fused.init(jax.random.PRNGKey(0), x, mask, False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(vf)
    out_ref = ref.apply(variables, x, mask, False)
    out_f = fused.apply(variables, x, mask, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=5e-6, rtol=1e-5)


def test_fused_layer_grads_match_unfused():
    """Full fwd+bwd parity: dx and every weight grad (partial-slab sum)
    against XLA autodiff of the unfused layer. The loss is a random
    projection — sum(y**2) is LayerNorm-shift-invariant and would zero all
    upstream grads, hiding errors."""
    ref, fused, variables, x, mask = _fused_layer_setup()
    rng = np.random.default_rng(7)
    G = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss(layer):
        return lambda p, xx: jnp.vdot(
            layer.apply({"params": p}, xx, mask, False), G)

    gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(variables["params"], x)
    gf_p, gf_x = jax.grad(loss(fused), argnums=(0, 1))(variables["params"], x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               atol=5e-6, rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(gr_p)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf_p)}
    for k, a in flat_r:
        b = flat_f[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(a).max()) + 1e-8
        err = float(jnp.abs(a - b).max())
        assert err < 1e-5 + 1e-3 * scale, (jax.tree_util.keystr(k), err)


def test_packed_heads_matches_per_head_loop(monkeypatch):
    """UNIREC_PACKED_HEADS=1 (block-diagonal two-head matmul packing,
    ops/layer.py::_attention_heads) is numerically identical to the shipped
    per-head loop: the softmax runs per-half on the same masked scores, so
    only f32 rounding of the zero-padded K2/V2 contractions differs. The
    flag shipped as a measured-negative opt-in (docs/performance_notes.md
    round-5 head-packing section); this pins its correctness in-suite."""
    import unirec_tpu.ops.layer as LY

    ref, fused, variables, x, mask = _fused_layer_setup(L=16)
    rng = np.random.default_rng(11)
    G = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss(p, xx):
        return jnp.vdot(fused.apply({"params": p}, xx, mask, False), G)

    out_loop = fused.apply(variables, x, mask, False)
    gl_p, gl_x = jax.grad(loss, argnums=(0, 1))(variables["params"], x)

    monkeypatch.setattr(LY, "_PACKED_HEADS", True)
    out_packed = fused.apply(variables, x, mask, False)
    gp_p, gp_x = jax.grad(loss, argnums=(0, 1))(variables["params"], x)

    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_loop),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gl_x),
                               atol=2e-6, rtol=1e-4)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gl_p),
            jax.tree_util.tree_leaves_with_path(gp_p)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-6, rtol=1e-4,
            err_msg=jax.tree_util.keystr(k))


def test_fused_layer_bf16_close_to_f32():
    """bf16 compute dtype: fused output within bf16 tolerance of the
    unfused bf16 path (kernel does softmax/LN in f32; XLA path in bf16)."""
    from unirec_tpu.models import modules

    ref, fused, variables, x, mask = _fused_layer_setup(L=16)
    ref16 = modules.TransformerLayer(2, 16, 32, 0.0, 0.0, "swish", 1e-12,
                                     dtype=jnp.bfloat16)
    f16 = modules.TransformerLayer(2, 16, 32, 0.0, 0.0, "swish", 1e-12,
                                   dtype=jnp.bfloat16, fused_layer=True)
    o_ref = ref16.apply(variables, x.astype(jnp.bfloat16), mask, False)
    o_f = f16.apply(variables, x.astype(jnp.bfloat16), mask, False)
    assert o_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o_f, np.float32),
                               np.asarray(o_ref, np.float32),
                               atol=0.05, rtol=0.05)


def test_fused_layer_encoder_integration():
    """TransformerEncoder(fused_layer=True) == unfused encoder on the same
    params, including composition with last_query_only (fused full layers
    feeding the single-query final layer)."""
    from unirec_tpu.models import modules
    import unirec_tpu.ops.layer as LY

    if not ON_TPU:
        LY._INTERPRET = True
    rng = np.random.default_rng(3)
    B, L, D = 3, 8, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    kw = dict(n_layers=2, n_heads=2, hidden_size=D, inner_size=32,
              hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
              hidden_act="gelu", layer_norm_eps=1e-12)
    enc_ref = modules.TransformerEncoder(**kw)
    enc_f = modules.TransformerEncoder(fused_layer=True, **kw)
    variables = enc_ref.init(jax.random.PRNGKey(0), x, mask, False)
    np.testing.assert_allclose(
        np.asarray(enc_f.apply(variables, x, mask, False)),
        np.asarray(enc_ref.apply(variables, x, mask, False)),
        atol=5e-6, rtol=1e-5)

    enc_ref_lq = modules.TransformerEncoder(last_query_only=True, **kw)
    enc_f_lq = modules.TransformerEncoder(fused_layer=True,
                                          last_query_only=True, **kw)
    np.testing.assert_allclose(
        np.asarray(enc_f_lq.apply(variables, x, mask, False)),
        np.asarray(enc_ref_lq.apply(variables, x, mask, False)),
        atol=5e-6, rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG dropout is TPU-only")
def test_fused_layer_dropout_statistics_and_grad_consistency():
    """Train mode on TPU: (a) dropout changes outputs and is deterministic
    per seed; (b) the backward's regenerated masks match the forward's —
    checked by finite differences along a random direction."""
    from unirec_tpu.models import modules

    rng = np.random.default_rng(11)
    B, L, D, F = 8, 16, 16, 32
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(1, 3, size=(B, L))  # no padding
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    layer = modules.TransformerLayer(2, D, F, 0.3, 0.3, "relu", 1e-12,
                                     fused_layer=True)
    variables = layer.init(jax.random.PRNGKey(0), x, mask, False)
    key = jax.random.PRNGKey(5)

    def fwd(xx):
        return layer.apply(variables, xx, mask, True,
                           rngs={"dropout": key})

    y1, y2 = fwd(x), fwd(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y_eval = layer.apply(variables, x, mask, False)
    assert float(jnp.abs(y1 - y_eval).max()) > 1e-3  # dropout actually on

    # fwd/bwd mask consistency: VJP directional derivative == finite diff
    v = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    g = jnp.asarray(rng.normal(size=y1.shape), jnp.float32)
    lossf = lambda xx: jnp.vdot(fwd(xx), g)
    jvp_via_grad = float(jnp.vdot(jax.grad(lossf)(x), v))
    eps = 1e-3
    fd = float((lossf(x + eps * v) - lossf(x - eps * v)) / (2 * eps))
    assert abs(jvp_via_grad - fd) < 5e-2 * (abs(fd) + 1.0), \
        (jvp_via_grad, fd)


# -------------------------------------------------- last-query layer kernel
def _lastq_setup(L=10, D=16, nh=2, F=32, B=4, act="swish", seed=0):
    import unirec_tpu.ops.layer as LY
    from unirec_tpu.models import modules

    if not ON_TPU:
        LY._INTERPRET = True
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    ref = modules.TransformerLayer(nh, D, F, 0.0, 0.0, act, 1e-12,
                                   last_query=True)
    fused = modules.TransformerLayer(nh, D, F, 0.0, 0.0, act, 1e-12,
                                     last_query=True, fused_lastq=True)
    variables = ref.init(jax.random.PRNGKey(0), x, mask, False)
    return ref, fused, variables, x, mask


@pytest.mark.parametrize("act,L", [
    ("swish", 10),   # Lp padding path (10 -> 16)
    ("gelu", 16),
    ("relu", 8),
])
def test_fused_lastq_forward_matches_unfused(act, L):
    """ops/layer.py::fused_last_query_layer == the unfused single-query
    path in eval mode ([B, 1, D] output, identical param tree)."""
    ref, fused, variables, x, mask = _lastq_setup(L=L, act=act)
    vf = fused.init(jax.random.PRNGKey(0), x, mask, False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(vf)
    out_ref = ref.apply(variables, x, mask, False)
    out_f = fused.apply(variables, x, mask, False)
    assert out_f.shape == out_ref.shape == (x.shape[0], 1, x.shape[2])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=5e-6, rtol=1e-5)


def test_fused_lastq_grads_match_unfused():
    """dx (K/V grads over ALL rows + q/residual grads at row L-1) and every
    weight grad against XLA autodiff of the unfused single-query layer."""
    ref, fused, variables, x, mask = _lastq_setup()
    rng = np.random.default_rng(7)
    G = jnp.asarray(rng.normal(size=(x.shape[0], 1, x.shape[2])),
                    jnp.float32)

    def loss(layer):
        return lambda p, xx: jnp.vdot(
            layer.apply({"params": p}, xx, mask, False), G)

    gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(variables["params"], x)
    gf_p, gf_x = jax.grad(loss(fused), argnums=(0, 1))(variables["params"], x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               atol=5e-6, rtol=1e-4)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf_p)}
    for k, a in jax.tree_util.tree_leaves_with_path(gr_p):
        b = flat_f[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(a).max()) + 1e-8
        err = float(jnp.abs(a - b).max())
        assert err < 1e-5 + 1e-3 * scale, (jax.tree_util.keystr(k), err)


def test_fused_lastq_encoder_integration():
    """TransformerEncoder(fused_layer + fused_lastq + last_query_only) ==
    the unfused lastq encoder: fused full layers feed the fused
    single-query final layer."""
    from unirec_tpu.models import modules
    import unirec_tpu.ops.layer as LY

    if not ON_TPU:
        LY._INTERPRET = True
    rng = np.random.default_rng(3)
    B, L, D = 3, 8, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    kw = dict(n_layers=2, n_heads=2, hidden_size=D, inner_size=32,
              hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
              hidden_act="gelu", layer_norm_eps=1e-12,
              last_query_only=True)
    enc_ref = modules.TransformerEncoder(**kw)
    enc_f = modules.TransformerEncoder(fused_layer=True, fused_lastq=True,
                                       **kw)
    variables = enc_ref.init(jax.random.PRNGKey(0), x, mask, False)
    out_ref = enc_ref.apply(variables, x, mask, False)
    out_f = enc_f.apply(variables, x, mask, False)
    assert out_f.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG dropout is TPU-only")
def test_fused_lastq_dropout_determinism_and_grad_consistency():
    """Train mode on TPU: deterministic per seed, dropout actually fires,
    and the backward's regenerated masks match the forward's (finite
    differences along a random direction)."""
    from unirec_tpu.models import modules

    rng = np.random.default_rng(11)
    B, L, D, F = 8, 16, 16, 32
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(1, 3, size=(B, L))  # no padding
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    layer = modules.TransformerLayer(2, D, F, 0.3, 0.3, "relu", 1e-12,
                                     last_query=True, fused_lastq=True)
    variables = layer.init(jax.random.PRNGKey(0), x, mask, False)
    key = jax.random.PRNGKey(5)

    def fwd(xx):
        return layer.apply(variables, xx, mask, True,
                           rngs={"dropout": key})

    y1, y2 = fwd(x), fwd(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y_eval = layer.apply(variables, x, mask, False)
    assert float(jnp.abs(y1 - y_eval).max()) > 1e-3

    v = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    g = jnp.asarray(rng.normal(size=y1.shape), jnp.float32)
    lossf = lambda xx: jnp.vdot(fwd(xx), g)
    jvp_via_grad = float(jnp.vdot(jax.grad(lossf)(x), v))
    eps = 1e-3
    fd = float((lossf(x + eps * v) - lossf(x - eps * v)) / (2 * eps))
    assert abs(jvp_via_grad - fd) < 5e-2 * (abs(fd) + 1.0), \
        (jvp_via_grad, fd)


@pytest.mark.parametrize("n_layers,L", [(3, 10), (2, 16), (1, 8)])
def test_fused_chain_depths_and_padding(n_layers, L):
    """The padded fused chain (encoder keeps the sublane-padded layout
    between kernels) matches the unfused lastq encoder at every depth,
    both when L needs padding (10->16) and when it is already aligned."""
    from unirec_tpu.models import modules
    import unirec_tpu.ops.layer as LY

    if not ON_TPU:
        LY._INTERPRET = True
    rng = np.random.default_rng(n_layers * 100 + L)
    B, D = 3, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    kw = dict(n_layers=n_layers, n_heads=2, hidden_size=D, inner_size=32,
              hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
              hidden_act="swish", layer_norm_eps=1e-12,
              last_query_only=True)
    enc_ref = modules.TransformerEncoder(**kw)
    enc_f = modules.TransformerEncoder(fused_layer=True, fused_lastq=True,
                                       **kw)
    variables = enc_ref.init(jax.random.PRNGKey(0), x, mask, False)
    out_ref = enc_ref.apply(variables, x, mask, False)
    out_f = enc_f.apply(variables, x, mask, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=5e-6, rtol=1e-5)
    # grads through the chain (slice-of-pad VJP + chained custom VJPs)
    G = jnp.asarray(rng.normal(size=np.asarray(out_ref).shape), jnp.float32)

    def loss(enc):
        return lambda p, xx: jnp.vdot(enc.apply({"params": p}, xx, mask,
                                                False), G)

    gr_p, gr_x = jax.grad(loss(enc_ref), argnums=(0, 1))(
        variables["params"], x)
    gf_p, gf_x = jax.grad(loss(enc_f), argnums=(0, 1))(
        variables["params"], x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               atol=5e-6, rtol=1e-4)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf_p)}
    for k, a in jax.tree_util.tree_leaves_with_path(gr_p):
        b = flat_f[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(a).max()) + 1e-8
        err = float(jnp.abs(a - b).max())
        assert err < 1e-5 + 1e-3 * scale, (jax.tree_util.keystr(k), err)


def test_last_query_bidirectional_mask():
    """A bidirectional mask broadcasts its query dim to 1 ([B,1,1,L]);
    the last-query paths must slice its (only) row, not index past it
    (regression: attn_mask[..., L-1:, :] yielded an empty [B,1,0,L])."""
    from unirec_tpu.models import modules

    rng = np.random.default_rng(5)
    B, L, D = 4, 10, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(0, 3, size=(B, L))
    item_seq[:, -3:] = 1
    bid = modules.causal_attention_mask(jnp.asarray(item_seq),
                                        bidirectional=True)
    full = modules.MultiHeadAttention(2, D, 0.0, 0.0, 1e-12)
    lq = modules.MultiHeadAttention(2, D, 0.0, 0.0, 1e-12, last_query=True)
    hs = modules.MultiHeadAttention(2, D, 0.0, 0.0, 1e-12, last_query=True,
                                    head_stacked=True)
    variables = full.init(jax.random.PRNGKey(0), x, bid, False)
    out_full = full.apply(variables, x, bid, False)[:, -1:, :]
    out_lq = lq.apply(variables, x, bid, False)
    out_hs = hs.apply(variables, x, bid, False)
    assert out_lq.shape == (B, 1, D)
    np.testing.assert_allclose(np.asarray(out_lq), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_hs), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG dropout is TPU-only")
@pytest.mark.parametrize("flags,mbk,bwdk", [
    (dict(fused_layer=True), "UNIREC_LAYER_MB", "UNIREC_LAYER_MB_BWD"),
    (dict(last_query=True, fused_lastq=True),
     "UNIREC_LASTQ_MB", "UNIREC_LASTQ_MB_BWD"),
])
def test_fused_layer_dropout_grads_across_grids(flags, mbk, bwdk,
                                                monkeypatch):
    """Dropout masks must be CANONICAL (per 8-example sub-block, global
    index), not per-program: the fwd and bwd kernels launch with different
    block sizes, and gradients must be bit-identical under every legal
    grid choice (regression: per-program seeds made the backward replay
    DIFFERENT masks than the forward applied whenever the grids differed
    — ~2% directional-gradient error at B=32 with the default MB 64/16)."""
    import os
    from unirec_tpu.models import modules

    rng = np.random.default_rng(11)
    B, L, D, F = 64, 16, 16, 32
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    item_seq = rng.integers(1, 3, size=(B, L))
    mask = modules.causal_attention_mask(jnp.asarray(item_seq))
    layer = modules.TransformerLayer(2, D, F, 0.3, 0.3, "relu", 1e-12,
                                     **flags)
    variables = layer.init(jax.random.PRNGKey(0), x, mask, False)
    key = jax.random.PRNGKey(5)

    def grad_with(mb, mb_bwd):
        monkeypatch.setenv(mbk, mb)
        monkeypatch.setenv(bwdk, mb_bwd)
        f = lambda xx: layer.apply(variables, xx, mask, True,
                                   rngs={"dropout": key})
        g = jnp.ones(np.asarray(f(x)).shape, jnp.float32)
        return jax.jit(jax.grad(lambda xx: jnp.vdot(f(xx), g)))(x)

    base = grad_with("64", "64")
    for mb, mb_bwd in (("64", "16"), ("16", "8"), ("32", "64")):
        got = grad_with(mb, mb_bwd)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base),
                                      err_msg=f"grid {mb}/{mb_bwd}")


def test_fused_layer_vmem_gate_scales_blocks():
    """The gate and the pallas_call wrappers share one calibrated footprint
    rule (r4 advisor: the old gate admitted L<=512 with blocks sized for
    L=56, failing Mosaic at runtime; boundaries re-measured on a real chip
    — see ops/layer.py::_FWD_CAP). Bench shape keeps the adopted 64/16
    blocks; L=128 auto-shrinks to 32/8 (compile-verified on TPU); L=256
    has no legal backward block, so the gate must route to XLA."""
    import unirec_tpu.ops.layer as LY

    B, D, F = 1024, 64, 256
    args = lambda L, env, d, cap: (B, -(-L // 8) * 8, D, F, env, d, cap)
    fwd = lambda L: LY._fit_mb(*args(L, "UNIREC_LAYER_MB", 64, LY._FWD_CAP))
    bwd = lambda L: LY._fit_mb(*args(L, "UNIREC_LAYER_MB_BWD", 16,
                                     LY._BWD_CAP))
    assert (fwd(50), bwd(50)) == (64, 16)
    assert (fwd(128), bwd(128)) == (32, 8)
    assert bwd(256) == 0

    old = LY._INTERPRET
    LY._INTERPRET = True
    try:
        import jax.numpy as jnp
        gate = lambda L: LY.fused_layer_supported(
            jnp.zeros((B, L, D)), "gelu", 2, F)
        assert gate(50) and gate(128) and not gate(256)
        # odd batch: whole-batch fallback only when the single program fits
        # BOTH directions (the old gate's "B <= 128" rule admitted batches
        # several times the measured-safe 16-row backward block)
        assert LY.fused_layer_supported(jnp.zeros((20, 50, D)), "gelu",
                                        2, F)
        assert not LY.fused_layer_supported(jnp.zeros((100, 50, D)),
                                            "gelu", 2, F)
    finally:
        LY._INTERPRET = old


def test_member_supported_gates_whole_batch_fallback():
    """member_supported rejects shapes whose B%8!=0 whole-batch fallback
    block exceeds the scoped-VMEM budget (r4 advisor: B=32k, C=200 odd
    batches crashed Mosaic instead of falling back to XLA)."""
    from unirec_tpu.ops import member

    old = member._INTERPRET
    member._INTERPRET = True
    try:
        assert member.member_supported()
        assert member.member_supported(1024, 200, 200)
        assert member.member_supported(100, 200, 200)   # tiny odd batch
        assert not member.member_supported(32_000 + 1, 200, 200)
    finally:
        member._INTERPRET = old


def test_vmem_scatter_accum_matches_numpy():
    """ops/scatter_accum.py: both VMEM scatter-accumulate kernels ==
    np.add.at, including non-8-aligned table sizes (the boundary tile RMW
    must not run out of bounds) and M not a block multiple (zero-padding)."""
    from unirec_tpu.ops import scatter_accum as SA

    old = SA._INTERPRET
    SA._INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        for (M, N, D) in ((4096, 5000, 64), (3000, 4996, 64),
                          (2048, 500, 8)):
            ids = jnp.asarray(rng.integers(0, N, M), jnp.int32)
            g = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
            want = np.zeros((N, D), np.float32)
            np.add.at(want, np.asarray(ids), np.asarray(g))
            got1 = np.asarray(SA.scatter_add_rows(ids, g, N))
            np.testing.assert_allclose(got1, want, atol=1e-4, rtol=1e-5)
            if N % 2 == 0:
                got2 = np.asarray(SA.scatter_add_rows2(ids, g, N))
                np.testing.assert_allclose(got2, want, atol=1e-4, rtol=1e-5)
    finally:
        SA._INTERPRET = old


def test_gather_vmem_grads_match_plain_gather():
    """gather_vmem forward == table[ids]; its custom backward (the VMEM
    scatter kernel) == XLA autodiff of the plain gather."""
    from unirec_tpu.ops import scatter_accum as SA

    old = SA._INTERPRET
    SA._INTERPRET = True
    try:
        rng = np.random.default_rng(5)
        table = jnp.asarray(rng.normal(size=(1000, 32)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, 1000, (64, 17)), jnp.int32)
        G = jnp.asarray(rng.normal(size=(64, 17, 32)), jnp.float32)

        def loss(fn):
            return lambda t: jnp.vdot(fn(t, ids), G)

        out = SA.gather_vmem(table, ids)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table[ids]))
        g_vmem = jax.grad(loss(SA.gather_vmem))(table)
        g_ref = jax.grad(loss(lambda t, i: t[i]))(table)
        np.testing.assert_allclose(np.asarray(g_vmem), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-5)
    finally:
        SA._INTERPRET = old
