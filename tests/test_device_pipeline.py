"""Device-side batch augmentation: semantic equivalence with the host
pipeline + end-to-end training."""
import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synth import BASE_CONF
from unirec_tpu.data.device_pipeline import DeviceAugmenter, RawIdBatcher
from unirec_tpu.data.history import UserHistory
from unirec_tpu.main import main


def _history(n_users=50, n_items=200, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(5, 30, size=n_users).astype(np.int32)
    cap = 30
    items = np.zeros((n_users, cap), np.int32)
    for u in range(n_users):
        items[u, :lens[u]] = rng.integers(1, n_items, size=lens[u])
    return UserHistory(items, lens)


def test_negatives_valid():
    hist = _history()
    cfg = {"n_items": 200, "n_sample_neg_train": 8, "max_seq_len": 10,
           "dataloader": "SeqRecDataset", "history_mask_mode": "autoregressive"}
    aug = DeviceAugmenter(cfg, hist)
    rng = np.random.default_rng(1)
    uid = rng.integers(1, 50, size=64).astype(np.int32)
    pos = rng.integers(1, 200, size=64).astype(np.int32)
    batch = aug.augment({"user_id": jnp.asarray(uid), "item_id": jnp.asarray(pos),
                         "weight": jnp.ones(64)}, jax.random.PRNGKey(0))
    negs = np.asarray(batch["item_id"][:, 1:])
    assert np.asarray(batch["item_id"][:, 0] == pos).all()
    # no negative equals its row positive or appears in the user history
    assert not (negs == pos[:, None]).any()
    in_hist = hist.contains(uid, negs.astype(np.int64))
    assert not in_hist[negs > 0].any() if in_hist.ndim == 1 else not in_hist[negs > 0].any()
    assert np.asarray(batch["label"][:, 0] == 1).all()
    assert np.asarray(batch["label"][:, 1:] == 0).all()


def test_window_matches_host_seq_last():
    """Deterministic (seq_last) truncation: device windows == host windows."""
    hist = _history(seed=3)
    cfg = {"n_items": 200, "n_sample_neg_train": 0, "max_seq_len": 8,
           "dataloader": "SeqRecDataset", "history_mask_mode": "autoregressive",
           "seq_last": 1}
    aug = DeviceAugmenter(cfg, hist)
    rng = np.random.default_rng(4)
    uid = rng.integers(1, 50, size=40).astype(np.int32)
    pos = rng.integers(1, 200, size=40).astype(np.int32)
    batch = aug.augment({"user_id": jnp.asarray(uid), "item_id": jnp.asarray(pos),
                         "weight": jnp.ones(40)}, jax.random.PRNGKey(0))
    hseq, hlen, _ = hist.sequence_batch(uid, pos, 8, mask_mode="autoregressive",
                                        seq_last=True)
    np.testing.assert_array_equal(np.asarray(batch["item_seq"]), hseq)
    np.testing.assert_array_equal(np.asarray(batch["item_seq_len"]), hlen)


def test_window_matches_host_unorder():
    hist = _history(seed=5)
    cfg = {"n_items": 200, "n_sample_neg_train": 0, "max_seq_len": 8,
           "dataloader": "SeqRecDataset", "history_mask_mode": "unorder"}
    aug = DeviceAugmenter(cfg, hist)
    rng = np.random.default_rng(6)
    uid = rng.integers(1, 50, size=40).astype(np.int32)
    pos = rng.integers(1, 200, size=40).astype(np.int32)
    batch = aug.augment({"user_id": jnp.asarray(uid), "item_id": jnp.asarray(pos),
                         "weight": jnp.ones(40)}, jax.random.PRNGKey(0))
    hseq, hlen, _ = hist.sequence_batch(uid, pos, 8, mask_mode="unorder")
    np.testing.assert_array_equal(np.asarray(batch["item_seq"]), hseq)
    np.testing.assert_array_equal(np.asarray(batch["item_seq_len"]), hlen)


def test_e2e_training_with_device_pipeline(synth_dataset, tmp_path):
    """Full main.run with device_pipeline=1 learns like the host path."""
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                loss_type="fullsoftmax", n_sample_neg_train=0, n_layers=1,
                epochs=6, learning_rate=0.005, hidden_dropout_prob=0.1,
                attn_dropout_prob=0.1, device_pipeline=1,
                dataset_path=root, task="train",
                output_path=os.path.join(str(tmp_path), "dp"))
    result = main.run(conf)
    assert result is not None
    assert result["hit@5"] > 2 * 5.0 / 300.0, result


def test_e2e_sampled_loss_device_pipeline(synth_dataset, tmp_path):
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, device_pipeline=1, epochs=3,
                dataset_path=root, task="train",
                output_path=os.path.join(str(tmp_path), "dpmf"))
    result = main.run(conf)
    assert result["hit@5"] > 0.05, result


# ----------------------------------------------- round-2 coverage extension
def test_features_and_time_match_host():
    """Feature-table gathers + time windows: device == host batcher."""
    n_items = 200
    rng = np.random.default_rng(7)
    lens = rng.integers(5, 30, size=50).astype(np.int32)
    items = np.zeros((50, 30), np.int32)
    times = np.zeros((50, 30), np.int32)
    for u in range(50):
        items[u, :lens[u]] = rng.integers(1, n_items, size=lens[u])
        times[u, :lens[u]] = np.sort(rng.integers(1, 50, size=lens[u]))
    hist = UserHistory(items, lens, times=times)
    feats = rng.integers(1, 7, size=(n_items, 2)).astype(np.int64)

    cfg = {"n_items": n_items, "n_sample_neg_train": 0, "max_seq_len": 8,
           "dataloader": "SeqRecDataset", "history_mask_mode": "autoregressive",
           "seq_last": 1, "time_seq": 64, "use_features": 1}
    aug = DeviceAugmenter(cfg, hist, features=feats)
    uid = rng.integers(1, 50, size=40).astype(np.int32)
    pos = rng.integers(1, n_items, size=40).astype(np.int32)
    batch = aug.augment({"user_id": jnp.asarray(uid),
                         "item_id": jnp.asarray(pos),
                         "weight": jnp.ones(40)}, jax.random.PRNGKey(0))
    hseq, hlen, htseq = hist.sequence_batch(uid, pos, 8,
                                            mask_mode="autoregressive",
                                            seq_last=True, with_time=True)
    np.testing.assert_array_equal(np.asarray(batch["item_seq"]), hseq)
    np.testing.assert_array_equal(np.asarray(batch["time_seq"]), htseq)
    np.testing.assert_array_equal(np.asarray(batch["item_features"]),
                                  feats[pos])
    np.testing.assert_array_equal(np.asarray(batch["item_seq_features"]),
                                  feats[hseq])


def test_grouped_rows_with_sampling():
    """T4 grouped rows: negatives reject every positive column; labels are
    laid out like the host batcher (pipeline.py:114-129)."""
    hist = _history(seed=8)
    cfg = {"n_items": 200, "n_sample_neg_train": 4, "max_seq_len": 8,
           "dataloader": "SeqRecDataset", "history_mask_mode": "unorder"}
    aug = DeviceAugmenter(cfg, hist)
    rng = np.random.default_rng(9)
    uid = rng.integers(1, 50, size=64).astype(np.int32)
    pos = rng.integers(1, 200, size=(64, 3)).astype(np.int32)
    label = np.zeros((64, 3), np.float32)
    label[:, 0] = 1.0
    batch = aug.augment({"user_id": jnp.asarray(uid),
                         "item_id": jnp.asarray(pos),
                         "label": jnp.asarray(label),
                         "weight": jnp.ones(64)}, jax.random.PRNGKey(1))
    item_id = np.asarray(batch["item_id"])
    lab = np.asarray(batch["label"])
    assert item_id.shape == (64, 7) and lab.shape == (64, 7)
    np.testing.assert_array_equal(item_id[:, :3], pos)
    np.testing.assert_array_equal(lab[:, :3], label)
    assert (lab[:, 3:] == 0).all()
    negs = item_id[:, 3:]
    assert not (negs[:, :, None] == pos[:, None, :]).any()
    in_hist = hist.contains(uid, negs.astype(np.int64))
    assert not in_hist[negs > 0].any()


def test_aerec_rows_match_host():
    from unirec_tpu.data.datasets import BaseDataset  # noqa: F401 (doc link)
    hist = _history(seed=10)
    cfg = {"n_items": 200, "n_sample_neg_train": 0, "max_seq_len": 8,
           "dataloader": "AERecDataset", "loss_type": "fullsoftmax"}
    aug = DeviceAugmenter(cfg, hist, aerec=True)
    uid = np.arange(1, 41).astype(np.int32)
    batch = aug.augment({"user_id": jnp.asarray(uid),
                         "item_id": jnp.zeros(40, jnp.int32),
                         "weight": jnp.ones(40)}, jax.random.PRNGKey(0))
    rows, lens = hist.gather(uid)
    np.testing.assert_array_equal(np.asarray(batch["item_seq"]), rows)
    np.testing.assert_array_equal(np.asarray(batch["item_seq_len"]), lens)


def test_e2e_rank_grouped_device_pipeline(synth_dataset, tmp_path):
    """BST on T4 grouped rows trains through the device pipeline and learns
    (same threshold as the host-path test in test_rank_models.py)."""
    from tests.test_rank_models import _conf
    conf = _conf(synth_dataset[0], str(tmp_path), "BST", device_pipeline=1,
                 exp_name="bst-dp")
    result = main.run(conf)
    assert result["auc"] > 0.65, result


def test_e2e_multivae_device_pipeline(synth_dataset, tmp_path):
    """AERec device batching == host batching (exact, batch level) plus an
    end-to-end device-path training smoke.

    The r4 version asserted an absolute hit@5 threshold; on this 200x300
    fixture that was decided by eval-noise luck in best-epoch selection
    (the r5 reference-parity eval noise exposed it: the r4 'pass' selected
    the UNTRAINED epoch-0 model via a lucky fixed-key validation score).
    Full-run metric equality between the paths is also not the contract —
    the augmenter path splits the step rng once more (trainer
    _build_train_step), so the dropout streams differ by design. What IS
    the contract: both paths feed the model identical batches, and the
    device path trains end-to-end."""
    import json

    from unirec_tpu import config as config_mod
    from unirec_tpu.data import pipeline as pl
    from unirec_tpu.data.datasets import AERecDataset
    from unirec_tpu.main.main import load_user_history

    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MultiVAE", dataloader="AERecDataset",
                dataset_path=root, n_sample_neg_train=0, shuffle_train=0,
                n_users=info["n_users"], n_items=info["n_items"])
    conf = config_mod.parse_arguments(conf, argv=[])
    conf["data_format"] = info.get("train_file_format",
                                   conf.get("data_format", "user-item"))
    ds = AERecDataset(conf, root, "train")
    hist = load_user_history(conf)
    host_batches = list(pl.make_train_batcher(ds, conf, hist))

    cols = ds.cols
    lens = np.zeros(conf["n_users"], np.int32)
    mat = np.zeros((conf["n_users"], cols["hist"].shape[1]),
                   cols["hist"].dtype)
    mat[cols["user_id"]] = cols["hist"]
    lens[cols["user_id"]] = cols["hist_len"]
    aug = DeviceAugmenter(dict(conf), UserHistory(mat, lens), aerec=True)
    rb = RawIdBatcher(cols["user_id"], np.zeros_like(cols["user_id"]),
                      int(conf.get("batch_size", 256)),
                      seed=int(conf.get("seed", 2022)), shuffle=False)
    for host_b, raw in zip(host_batches, rb):
        dev_b = aug.augment(
            aug.with_state({k: jnp.asarray(v) for k, v in raw.items()}),
            jax.random.PRNGKey(0))
        for k in ("item_seq", "item_seq_len", "user_id", "weight"):
            np.testing.assert_array_equal(np.asarray(host_b[k]),
                                          np.asarray(dev_b[k]), err_msg=k)

    # e2e smoke: the device path trains and evaluates without error
    run_conf = copy.deepcopy(BASE_CONF)
    run_conf.update(model="MultiVAE", dataloader="AERecDataset",
                    n_sample_neg_train=0, device_pipeline=1, epochs=3,
                    learning_rate=0.005, dataset_path=root, task="train",
                    exp_name="vae-dp",
                    output_path=os.path.join(str(tmp_path), "dpvae"))
    result = main.run(run_conf)
    assert result and all(np.isfinite(v) for v in result.values()), result


@pytest.mark.parametrize("C", [2, 4, 8, 37, 64])
def test_membership_binary_search_matches_compare(C):
    """The opt-in binary-search membership (neg_membership_binary_search)
    must agree exactly with the default broadcast compare, and the full
    augment must be identical under the same PRNG key.

    Power-of-two capacities (2/4/8/64) are the regression surface for the
    step-count bug: ceil(log2(C)) halvings leave a width-2 interval and
    return false negatives; the search needs ceil(log2(C+1))."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirec_tpu.data.device_pipeline import DeviceAugmenter
    from unirec_tpu.data.history import UserHistory

    rng = np.random.default_rng(0)
    U, NI = 300, 500
    lens = rng.integers(0, C, U).astype(np.int32)
    items = np.zeros((U, C), np.int32)
    m = np.arange(C)[None, :] < lens[:, None]
    items[m] = rng.integers(1, NI, int(m.sum()))
    hist = UserHistory(items, lens)
    cfg = {"n_items": NI, "n_sample_neg_train": 5, "max_seq_len": 10,
           "dataloader": "SeqRecDataset",
           "history_mask_mode": "autoregressive"}
    aug_bin = DeviceAugmenter(dict(cfg, neg_membership_binary_search=1), hist)
    aug_cmp = DeviceAugmenter(dict(cfg, neg_membership_binary_search=0), hist)
    assert "hist_sorted" in aug_bin.state
    assert "hist_sorted" not in aug_cmp.state

    B = 128
    uid = rng.integers(0, U, B).astype(np.int32)
    batch = {"user_id": jnp.asarray(uid),
             "item_id": jnp.asarray(rng.integers(1, NI, B).astype(np.int32)),
             "weight": jnp.ones(B, jnp.float32)}
    key = jax.random.PRNGKey(3)
    fa = aug_bin.augment(aug_bin.with_state(dict(batch)), key)
    fb = aug_cmp.augment(aug_cmp.with_state(dict(batch)), key)
    for k in fb:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))

    # direct exhaustive check: every candidate id 0..NI-1 against every
    # user's history — binary search == broadcast compare, bit for bit
    # (the augment path above only samples a few candidates per user).
    rows = jnp.asarray(items)
    srt = aug_bin.state["hist_sorted"]
    cand = jnp.tile(jnp.arange(min(NI, 128), dtype=jnp.int32)[None, :],
                    (U, 1))
    got = np.asarray(aug_bin._membership(rows, cand, sorted_rows=srt))
    want = np.asarray(aug_cmp._membership(rows, cand))
    np.testing.assert_array_equal(got, want)


def test_auto_resume_device_pipeline(synth_dataset, tmp_path):
    """auto_resume composes with the device pipeline: a 2-epoch run resumed
    to 4 equals a straight 4-epoch run exactly (RawIdBatcher's shuffle
    epoch fast-forwards like the host Batcher's)."""
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                device_pipeline=1, auto_resume=1, dataset_path=root,
                task="train")
    a = main.run(dict(conf, epochs=4, exp_name="ardp_a",
                      output_path=os.path.join(str(tmp_path), "a")))
    out_b = os.path.join(str(tmp_path), "b")
    main.run(dict(conf, epochs=2, exp_name="ardp_b", output_path=out_b))
    b = main.run(dict(conf, epochs=4, exp_name="ardp_b", output_path=out_b))
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


def test_pallas_membership_matches_broadcast_compare():
    """ops/member.py::member_mask == the [B, K, C] broadcast compare for
    random histories/candidates incl. zero (padding) candidates."""
    import numpy as np
    import jax.numpy as jnp
    from unirec_tpu.ops import member

    member._INTERPRET = True
    try:
        rng = np.random.default_rng(0)
        for B, C, K in ((16, 37, 12), (32, 64, 36), (8, 200, 5)):
            rows = rng.integers(0, 50, (B, C)).astype(np.int32)
            cand = rng.integers(0, 50, (B, K)).astype(np.int32)
            cand[:, 0] = 0  # padding candidate must never be a member
            got = np.asarray(member.member_mask(jnp.asarray(rows),
                                                jnp.asarray(cand)))
            want = ((cand[:, :, None] == rows[:, None, :])
                    & (cand[:, :, None] > 0)).any(-1)
            np.testing.assert_array_equal(got, want, err_msg=f"{B},{C},{K}")
    finally:
        member._INTERPRET = False
