"""Trainer-level feature tests: parameter freeze on pretrain load, the
BPR/CCL compliance check, the prefetching batcher, and the sweep driver."""
import copy
import os

import numpy as np
import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main


def _mf_conf(root, out, **kw):
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, dataset_path=root, output_path=out,
                task="train", epochs=2, exp_name="tf")
    conf.update(kw)
    return conf


def test_freeze_pretrained(synth_dataset, tmp_path):
    root, info = synth_dataset
    pre_out = os.path.join(str(tmp_path), "pre")
    main.run(_mf_conf(root, pre_out))
    ckpt = os.path.join(pre_out, "checkpoint", "tf.pkl")

    import pickle
    before = pickle.load(open(ckpt, "rb"))["params"]

    fin_out = os.path.join(str(tmp_path), "fin")
    main.run(_mf_conf(root, fin_out, load_pretrained_model=True,
                      model_file=ckpt, freeze=1, epochs=2,
                      exp_name="tf-frozen"))
    after = pickle.load(open(os.path.join(fin_out, "checkpoint",
                                          "tf-frozen.pkl"), "rb"))["params"]
    # every pretrained param must be bit-identical after "training"
    np.testing.assert_array_equal(
        np.asarray(before["item_embedding"]["embedding"]),
        np.asarray(after["item_embedding"]["embedding"]))
    np.testing.assert_array_equal(
        np.asarray(before["user_embedding"]["embedding"]),
        np.asarray(after["user_embedding"]["embedding"]))


def test_compliance_check_rejects_bad_groups():
    from unirec_tpu.facility.trainer import Trainer
    t = Trainer.__new__(Trainer)
    t.config = {"loss_type": "bpr"}
    bad = {"label": np.zeros((4, 3), np.float32),
           "weight": np.ones(4, np.float32)}
    np.random.seed(0)
    with pytest.raises(ValueError, match="compliance"):
        for _ in range(200):  # triggers with prob 0.1 per call
            t._maybe_check_compliance(bad)


def test_prefetch_batcher_equivalence(synth_dataset):
    root, info = synth_dataset
    from unirec_tpu import config as config_mod
    from unirec_tpu.data.datasets import BaseDataset
    from unirec_tpu.data.pipeline import Batcher, PrefetchBatcher
    cfg = config_mod.parse_arguments(
        dict(BASE_CONF, dataset_path=root, data_format="user-item",
             data_loader_task="train", n_items=info["n_items"],
             n_users=info["n_users"]), argv=[])
    ds = BaseDataset(cfg, root, "train")
    plain = list(Batcher(ds, cfg, seed=5))
    wrapped = list(PrefetchBatcher(Batcher(ds, cfg, seed=5), depth=2))
    assert len(plain) == len(wrapped)
    for a, b in zip(plain, wrapped):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_sweep_driver(synth_dataset, tmp_path):
    import yaml

    from unirec_tpu.facility.sweep import run_sweep
    root, info = synth_dataset
    sweep_file = os.path.join(str(tmp_path), "sweep.yaml")
    yaml.safe_dump({
        "method": "grid",
        "metric": {"name": "ndcg@5", "goal": "maximize"},
        "parameters": {"learning_rate": {"values": [0.0005, 0.005]}},
    }, open(sweep_file, "w"))
    base = _mf_conf(root, os.path.join(str(tmp_path), "sweep"), epochs=2)
    best, records = run_sweep(sweep_file, base)
    assert len(records) == 2
    assert best is not None and "ndcg@5" in best
    assert os.path.exists(os.path.join(str(tmp_path), "sweep",
                                       "sweep_results.tsv"))
    # the higher lr clearly wins on this dataset
    assert best["learning_rate"] == 0.005


def test_bfloat16_compute(synth_dataset, tmp_path):
    """compute_dtype=bfloat16 runs the dense towers in bf16 (params stay
    fp32, losses fp32) and still learns."""
    root, info = synth_dataset
    conf = _mf_conf(root, os.path.join(str(tmp_path), "bf16"),
                    model="SASRec", dataloader="SeqRecDataset",
                    loss_type="fullsoftmax", n_sample_neg_train=0,
                    n_layers=1, epochs=4, learning_rate=0.005,
                    has_user_emb=False, compute_dtype="bfloat16",
                    exp_name="bf16")
    result = main.run(conf)
    assert result is not None and result["hit@5"] > 5.0 / 300.0, result
    import pickle
    params = pickle.load(open(os.path.join(str(tmp_path), "bf16",
                                           "checkpoint", "bf16.pkl"),
                              "rb"))["params"]
    import jax
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == np.float32


def test_orbax_checkpoint_backend(synth_dataset, tmp_path):
    """checkpoint_backend=orbax: sharded-capable parameter checkpoint +
    sidecar; train -> test-from-checkpoint reproduces metrics exactly."""
    root, info = synth_dataset
    out = os.path.join(str(tmp_path), "orbax")
    conf = _mf_conf(root, out, checkpoint_backend="orbax", epochs=3,
                    exp_name="orb")
    r1 = main.run(conf)
    ckpt_dir = os.path.join(out, "checkpoint", "orb.pkl.orbax")
    assert os.path.isdir(ckpt_dir), os.listdir(os.path.join(out, "checkpoint"))
    conf2 = dict(conf)
    conf2.update(task="test", model_file=ckpt_dir,
                 output_path=os.path.join(str(tmp_path), "orbax-test"))
    r2 = main.run(conf2)
    assert abs(r1["ndcg@5"] - r2["ndcg@5"]) < 1e-6, (r1, r2)


def test_auto_resume_matches_uninterrupted_run(synth_dataset, tmp_path):
    """auto_resume=1 writes a rolling `.last` checkpoint each epoch and a
    fresh process continues from it with FULL state (params, optimizer
    moments, epoch counter, early-stop patience, RNG step, batcher shuffle
    epoch). A 3-epoch run 'preempted' and resumed to 6 epochs must equal a
    straight 6-epoch run exactly (training is deterministic)."""
    root, info = synth_dataset
    out_a = os.path.join(str(tmp_path), "straight")
    r_straight = main.run(_mf_conf(root, out_a, epochs=6, auto_resume=1,
                                   exp_name="ar_a"))

    out_b = os.path.join(str(tmp_path), "resumed")
    main.run(_mf_conf(root, out_b, epochs=3, auto_resume=1, exp_name="ar_b"))
    last = os.path.join(out_b, "checkpoint", "ar_b.pkl.last")
    assert os.path.exists(last), os.listdir(os.path.join(out_b, "checkpoint"))
    import pickle
    ck = pickle.load(open(last, "rb"))
    assert ck["cur_epoch"] == 3 and ck["opt_state"] is not None
    r_resumed = main.run(_mf_conf(root, out_b, epochs=6, auto_resume=1,
                                  exp_name="ar_b"))

    for k in r_straight:
        assert abs(r_straight[k] - r_resumed[k]) < 1e-9, \
            (k, r_straight[k], r_resumed[k])


def test_resume_preserves_zero_patience():
    """A saved early-stop patience of 0 (the last eval improved) must
    survive resume as 0 — a falsy `or 1` coercion would make the resumed
    run early-stop one evaluation sooner than the uninterrupted one."""
    import logging

    from unirec_tpu.facility.trainer import Trainer

    t = object.__new__(Trainer)
    t.scheduler = None
    t.logger = logging.getLogger("resume-test")
    t.key_metric = "ndcg@5"
    t.load_model = lambda f, restore_optimizer=True: {
        "cur_epoch": 3, "cur_step": 0, "best_score": 0.5,
        "best_valid_result": None, "global_step": 42,
        "scheduler_state": None}
    t.resume("ignored")
    assert t.cur_step == 0
    assert t.cur_epoch == 3 and t._global_step == 42


def test_keyboard_interrupt_falls_through_to_test_eval(synth_dataset,
                                                       tmp_path,
                                                       monkeypatch):
    """Ctrl-C during fit still evaluates on the test set and persists the
    result.tsv (reference main.py:376-377). Injected deterministically: the
    epoch-2 validation raises KeyboardInterrupt AFTER epoch 1 saved a best
    checkpoint; the final test evaluation (a later call) runs normally."""
    from unirec_tpu.facility.trainer import Trainer

    root, _ = synth_dataset
    out = os.path.join(str(tmp_path), "kbint")
    conf = _mf_conf(root, out, epochs=5, exp_name="kbint")

    real_evaluate = Trainer.evaluate
    calls = {"n": 0}

    def interrupting_evaluate(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch-2 validation, mid-fit
            raise KeyboardInterrupt
        return real_evaluate(self, *a, **kw)

    monkeypatch.setattr(Trainer, "evaluate", interrupting_evaluate)
    res = main.run(conf)
    assert res and all(np.isfinite(v) for v in res.values())
    assert calls["n"] >= 3  # the post-interrupt test eval did run
    res_file = os.path.join(out, "kbint.result.tsv")
    assert os.path.exists(res_file)
    with open(res_file) as f:
        header, values = f.read().strip().split("\n")
    assert len(header.split("\t")) == len(values.split("\t"))
