"""Golden dress rehearsal: the published ml-100k baseline run, executed
end-to-end against the ACTUAL reference, on an ml-100k-scale synthetic
dataset.

The reference's only published baseline is the golden metric table on real
ml-100k (tests/test_model/test_seq_model.py:60-75, test_cf_model.py:60-68;
seed 2022, 3 epochs, tol 0.05). This environment has no network egress, so
the real dataset is unreachable (test_golden_ml100k.py skips and remains
the authoritative check wherever the data exists). This module is the
strongest possible substitute: everything in the golden run — the raw
format, the rating>=3 / dedup / 10-core / leave-one-out preprocessing
(data/downloaders.convert_ml100k), the GLOBAL_CONF hyperparameters, the
seed, the epoch budget, the one-vs-all protocol — is identical; only the
ratings themselves are synthetic (943 users x 1682 items x ~100k rows
with ml-100k's marginals, tests/synth.py::gen_ml100k_shaped). The
REFERENCE ITSELF (torch, run read-only from /root/reference) is trained on
the same files and our metrics must match or beat it within the golden
tolerance.

Recorded result (2026-08-20, this tree): our SASRec hit@5 equals the
reference's to 6 decimals (0.0636267 = 60/943 users hit), ndcg@5 is
+0.001 above it; MF matches within 0.002. See
docs/evidence/golden_rehearsal_r4.md for the full table.

Default run covers the two flagship models (SASRec, MF) to bound suite
time (the torch reference needs ~7 CPU-minutes for SASRec alone); set
UNIREC_REHEARSAL_FULL=1 to run all eight golden seq/CF models.
"""
import copy
import os
import shutil

import pytest

pytestmark = pytest.mark.rehearsal

TOL = 0.05  # the reference's own golden tolerance (test_seq_model.py:18-19)

# reference GLOBAL_CONF (test_seq_model.py:21-56), shared verbatim by both
# frameworks below
GLOBAL_CONF = {
    "dataloader": "SeqRecDataset",
    "learning_rate": 0.001,
    "loss_type": "bce",
    "epochs": 3,
    "batch_size": 512,
    "n_sample_neg_train": 9,
    "valid_protocol": "one_vs_all",
    "test_protocol": "one_vs_all",
    "metrics": "['hit@5;10','ndcg@5;10']",
    "key_metric": "ndcg@5",
    "embedding_size": 64,
    "hidden_size": 64,
    "max_seq_len": 10,
    "history_mask_mode": "autoregressive",
    "early_stop": -1,
    "shuffle_train": 1,
    "seed": 2022,
    "user_history_filename": "user_history",
}

# per-model extras, applied IDENTICALLY to both frameworks
MODEL_CONF = {
    "SASRec": {"n_layers": 2, "n_heads": 2, "inner_size": 128},
    "MF": {"dataloader": "BaseDataset", "has_user_emb": 1},
    "GRU": {},
    "AvgHist": {},
    "AttHist": {},
    "SVDPlusPlus": {},
    "ConvFormer": {"conv_size": 4, "n_layers": 2},
    "FASTConvFormer": {"conv_size": 4, "n_layers": 2},
    # the remaining golden SGD model (test_cf_model.py:61); solver models
    # (EASE/SLIM/...) are deterministic and already have EXACT parity in
    # test_reference_e2e.py::test_solver_models_exact_parity
    "MultiVAE": {"dataloader": "AERecDataset"},
}
DEFAULT_MODELS = ["SASRec", "MF"]
MODELS = (sorted(MODEL_CONF) if os.environ.get("UNIREC_REHEARSAL_FULL")
          else DEFAULT_MODELS)


@pytest.fixture(scope="module")
def ml100k_shaped(tmp_path_factory):
    """Raw gen -> convert_ml100k -> convert_splits, exactly as
    test_golden_ml100k.py does with the real archive."""
    from tests.synth import gen_ml100k_shaped
    from unirec_tpu.data.downloaders import convert_ml100k
    from unirec_tpu.data.prepare import convert_splits

    work = tmp_path_factory.mktemp("ml100k_shaped")
    raw = str(work / "raw")
    gen_ml100k_shaped(raw)
    splits = str(work / "splits")
    convert_ml100k(os.path.join(raw, "u.data"), os.path.join(raw, "u.item"),
                   splits)
    ds = str(work / "ds")
    info = convert_splits(splits, ds)
    return ds, info


@pytest.fixture(scope="module")
def ref_config(ml100k_shaped, tmp_path_factory):
    """Writable copy of the reference's config dir with the rehearsal
    dataset registered (the reference resolves dataset yaml by name)."""
    from tests.refshim import REFERENCE, setup_reference_shims
    setup_reference_shims()
    ds, info = ml100k_shaped
    cfg_dir = str(tmp_path_factory.mktemp("refcfg"))
    shutil.copytree(os.path.join(REFERENCE, "unirec", "config"), cfg_dir,
                    dirs_exist_ok=True)
    with open(os.path.join(cfg_dir, "dataset", "rehearsal.yaml"), "w") as f:
        f.write(f"n_users: {info['n_users']}\nn_items: {info['n_items']}\n"
                "group_size: -1\n"
                "train_file_format: user-item\nvalid_file_format: user-item\n"
                "test_file_format: user-item\n"
                "user_history_file_format: user-item_seq\n")
    return cfg_dir


def _run_reference(cfg_dir, ds, out_dir, model, extra=None):
    from unirec.main import main as refmain
    args = dict(GLOBAL_CONF)
    args.update({
        "config_dir": cfg_dir, "exp_name": f"ref-{model}", "model": model,
        "dataset": "rehearsal", "dataset_path": ds, "output_path": out_dir,
        "task": "train", "gpu_id": -1, "use_wandb": 0, "use_tensorboard": 0,
        "num_workers": 0, "num_workers_test": 0, "verbose": 2,
    })
    args.update(MODEL_CONF[model])
    args.update(extra or {})
    return {k: float(v) for k, v in refmain.run(args).items()}


def _run_ours(ds, out_dir, model, extra=None):
    from unirec_tpu.main import main
    conf = copy.deepcopy(GLOBAL_CONF)
    conf.update(model=model, dataset_path=ds, output_path=out_dir,
                exp_name=f"ours-{model}", task="train", verbose=1)
    conf.update(MODEL_CONF[model])
    conf.update(extra or {})
    return {k: float(v) for k, v in main.run(conf).items()}


@pytest.mark.parametrize("model", MODELS)
def test_golden_rehearsal(ml100k_shaped, ref_config, tmp_path, model):
    ds, _ = ml100k_shaped
    ref = _run_reference(ref_config, ds,
                         os.path.join(str(tmp_path), f"ref-{model}"), model)
    ours = _run_ours(ds, os.path.join(str(tmp_path), f"ours-{model}"), model)
    # the run must be meaningful, not a degenerate tie at ~0 (MultiVAE is
    # the exception: its published real-data golden is itself near-random
    # at 3 epochs — hit@5 0.01065, test_cf_model.py:61 — so only pipeline
    # parity is asserted there)
    if model != "MultiVAE":
        assert ref["hit@5"] > 0.02, (model, ref)
    for m in ("hit@5", "ndcg@5", "hit@10", "ndcg@10"):
        assert ours[m] >= ref[m] - TOL, (model, m, ref, ours)


def test_multivae_meaningful_budget(ml100k_shaped, ref_config, tmp_path):
    """MultiVAE rehearsal at a budget where the REFERENCE demonstrably
    learns (VERDICT r4 item 6): the 3-epoch published golden is itself
    near-random (hit@5 0.01065, reference test_cf_model.py:61), so the
    band-parity case above proves only plumbing. At 40 epochs on the
    ml-100k-shaped set the reference clears the >0.02 learning gate
    (random hit@5 ~ 5/1682 = 0.003) with the KL anneal schedule advancing
    exactly as multivae.py:106-109; ours must match or beat within the
    golden tolerance. Budget override: UNIREC_REHEARSAL_VAE_EPOCHS."""
    import json

    ds, _ = ml100k_shaped
    extra = {"epochs": int(os.environ.get("UNIREC_REHEARSAL_VAE_EPOCHS", 40)),
             "early_stop": -1}
    ref = _run_reference(ref_config, ds,
                         os.path.join(str(tmp_path), "ref-vae40"),
                         "MultiVAE", extra)
    ours = _run_ours(ds, os.path.join(str(tmp_path), "ours-vae40"),
                     "MultiVAE", extra)
    rec = os.environ.get("UNIREC_REHEARSAL_RECORD")
    if rec:
        with open(rec, "a") as f:
            f.write(json.dumps({"case": "MultiVAE", "epochs": extra["epochs"],
                                "reference": ref, "ours": ours}) + "\n")
    assert ref["hit@5"] > 0.02, ("reference failed to learn", ref)
    for m in ("hit@5", "ndcg@5", "hit@10", "ndcg@10"):
        assert ours[m] >= ref[m] - TOL, (m, ref, ours)
