"""End-to-end behavioral parity: run the REFERENCE (torch) pipeline and
ours on the same synthetic dataset with the same hyperparameters, and
require our metrics to be at least as good (within noise) as the
reference's.

The reference is executed read-only from /root/reference with small
environment shims (numba pass-through, torch>=2.6 compat for
ReduceLROnPlateau's removed ``verbose`` kwarg and torch.load's
weights_only default). Metric definitions are already proven identical in
test_reference_parity.py; this covers the full train->eval pipeline.
"""
import copy
import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.rehearsal

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_env(tmp_path_factory):
    from tests.refshim import setup_reference_shims
    setup_reference_shims()

    # the reference resolves dataset yaml from its config dir (read-only);
    # give it a writable copy with the synth dataset registered
    cfg_dir = str(tmp_path_factory.mktemp("refconfig"))
    import shutil
    shutil.copytree(os.path.join(REFERENCE, "unirec", "config"), cfg_dir,
                    dirs_exist_ok=True)
    with open(os.path.join(cfg_dir, "dataset", "synthref.yaml"), "w") as f:
        f.write("n_users: 201\nn_items: 301\ngroup_size: -1\n"
                "train_file_format: user-item\nvalid_file_format: user-item\n"
                "test_file_format: user-item\n"
                "user_history_file_format: user-item_seq\n")
    fmt_rank = "user-item_group-label_group"
    with open(os.path.join(cfg_dir, "dataset", "synthrank.yaml"), "w") as f:
        f.write("n_users: 201\nn_items: 301\ngroup_size: -1\n"
                f"train_file_format: {fmt_rank}\n"
                f"valid_file_format: {fmt_rank}\n"
                f"test_file_format: {fmt_rank}\n"
                "user_history_file_format: user-item_seq\n")
    fmt_fm = "label-index_group-value_group"
    with open(os.path.join(cfg_dir, "dataset", "synthfm.yaml"), "w") as f:
        f.write("n_users: 201\nn_items: 301\nn_feats: 503\ngroup_size: -1\n"
                f"train_file_format: {fmt_fm}\nvalid_file_format: {fmt_fm}\n"
                f"test_file_format: {fmt_fm}\n"
                "user_history_file_format: user-item_seq\n")
    return cfg_dir


def _run_reference(cfg_dir, data_root, out_dir, **overrides):
    from unirec.main import main as refmain
    args = {
        "config_dir": cfg_dir, "exp_name": "refrun", "model": "MF",
        "dataloader": "BaseDataset", "dataset": "synthref",
        "dataset_path": data_root, "output_path": out_dir,
        "user_history_filename": "user_history",
        "learning_rate": 0.01, "epochs": 5, "batch_size": 256,
        "n_sample_neg_train": 9, "valid_protocol": "one_vs_all",
        "test_protocol": "one_vs_all",
        "history_mask_mode": "autoagressive",
        "metrics": "['hit@5;10', 'ndcg@5;10']", "key_metric": "ndcg@5",
        "loss_type": "bce", "has_user_emb": 1, "embedding_size": 32,
        "shuffle_train": 1, "early_stop": -1, "seed": 2022, "verbose": 2,
        "task": "train", "gpu_id": -1, "use_wandb": 0, "use_tensorboard": 0,
        "num_workers": 0, "num_workers_test": 0,
    }
    args.update(overrides)
    return {k: float(v) for k, v in refmain.run(args).items()}


def _run_ours(data_root, out_dir, **overrides):
    from tests.synth import BASE_CONF
    from unirec_tpu.main import main
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", has_user_emb=True,
                learning_rate=0.01, epochs=5, loss_type="bce",
                dataset_path=data_root, output_path=out_dir, task="train",
                exp_name="ours")
    conf.update(overrides)
    return main.run(conf)


@pytest.mark.parametrize("loss", ["bce", "bpr"])
def test_mf_beats_or_matches_reference(reference_env, synth_dataset,
                                       tmp_path, loss):
    root, info = synth_dataset
    ref = _run_reference(reference_env, root,
                         os.path.join(str(tmp_path), f"ref-{loss}"),
                         loss_type=loss)
    ours = _run_ours(root, os.path.join(str(tmp_path), f"ours-{loss}"),
                     loss_type=loss, exp_name=f"ours-{loss}")
    # identical data + hyperparameters: we must not lose accuracy (the
    # reference's own golden tolerance is ±0.05, test_seq_model.py:18-19)
    for m in ("hit@5", "ndcg@5"):
        assert ours[m] >= ref[m] - 0.05, (loss, m, ref, ours)
    assert ours["hit@10"] > 0.0 and ref["hit@10"] > 0.0


def test_sasrec_matches_reference(reference_env, synth_dataset, tmp_path):
    """SASRec full-softmax pipeline parity. Note: the reference's own test
    configs misspell the mask mode as 'autoagressive', which silently
    matches neither branch of its AddUserHistory (adduserhistory.py:48-73) —
    no target masking happens and the target leaks into the input sequence.
    This test runs the reference with the *correct* spelling so both
    pipelines do real autoregressive masking. (Forward passes are bit-exact
    given equal weights — verified via the torch-checkpoint importer.)"""
    root, info = synth_dataset
    common = dict(model="SASRec", dataloader="SeqRecDataset",
                  loss_type="fullsoftmax", n_sample_neg_train=0,
                  epochs=6, learning_rate=0.005, n_layers=1, n_heads=2,
                  inner_size=64, hidden_dropout_prob=0.1,
                  attn_dropout_prob=0.1)
    ref = _run_reference(reference_env, root,
                         os.path.join(str(tmp_path), "ref-sas"),
                         history_mask_mode="autoregressive",
                         max_seq_len=10, hidden_size=32, **common)
    ours = _run_ours(root, os.path.join(str(tmp_path), "ours-sas"),
                     exp_name="ours-sas", **common)
    for m in ("hit@5", "ndcg@5", "hit@10", "ndcg@10"):
        assert ours[m] >= ref[m] - 0.05, (m, ref, ours)


@pytest.mark.parametrize("model", ["EASE", "SAR", "UserCF", "AdmmSLIM",
                                   "SLIM"])
def test_solver_models_exact_parity(reference_env, synth_dataset, tmp_path,
                                    model):
    """Closed-form solvers are deterministic: same interaction graph →
    the reference's numpy/scipy solution and our on-device XLA solution
    must produce (near-)identical one-vs-all metrics. (AdmmSLIM needs the
    scipy sparse ``.A`` shim in reference_env — modern scipy removed it.)

    SLIM is the one *replacement algorithm* in the solver family: the
    reference runs n_items sklearn ElasticNet fits (slim.py:22-66,
    random-selection CD, tol=1e-4); ours is vectorized cyclic CD on the
    Gram (solvers.py). Both optimize the same convex objective and the
    converged W matrices agree to <2e-3 max-abs with identical support
    (test_linalg.py::test_slim_matches_sklearn_elasticnet).

    The realized metrics differ for a REFERENCE-side reason: its sparse
    full-catalog path scores SLIM with the TRANSPOSED similarity — the
    numba kernel sums rows of forward_all_item_emb() == B.T
    (ease.py:12-22,131-138 via evaluator_abc.py:227-229), i.e.
    score(u,i) = Σ_{j∈hist} B[i,j], while its own dense path (EASE) and
    the SLIM objective use Σ_j B[j,i]. Invisible for symmetric
    similarities (SAR), wrong-direction for SLIM's asymmetric B. So for
    SLIM we assert (a) ours ≥ ref (correct scoring can only help) and
    (b) ours with B purposely transposed == ref within atol — proof we
    reproduce the reference bit-for-bug when emulating its quirk."""
    root, info = synth_dataset
    extra = {}
    if model == "SLIM":
        # compare at CONVERGENCE: with the harness default epochs=5 both
        # CD schemes stop far from the optimum (sklearn max_iter=5 random
        # -selection vs our 5 cyclic sweeps) and the half-solved metrics
        # differ by ~0.02 (ours ahead). At 200 iterations the two W
        # matrices agree to <1e-3 max-abs with identical support
        # (test_linalg.py::test_slim_matches_sklearn_elasticnet).
        extra = {"epochs": 200, "slim_max_sweeps": 200}
    ref = _run_reference(reference_env, root,
                         os.path.join(str(tmp_path), f"ref-{model}"),
                         model=model, dataloader="AERecDataset",
                         n_sample_neg_train=0, exp_name=f"ref-{model}",
                         **{k: v for k, v in extra.items()
                            if k != "slim_max_sweeps"})
    ours = _run_ours(root, os.path.join(str(tmp_path), f"ours-{model}"),
                     model=model, dataloader="AERecDataset",
                     n_sample_neg_train=0, exp_name=f"ours-{model}", **extra)
    # AdmmSLIM runs 100 ADMM sweeps in device f32 vs the reference's host
    # f64 — near-tie ranks can flip for a user or two (1 user = 5e-3 here);
    # the direct solvers are a single solve and stay within 2e-3.
    atol = 8e-3 if model == "AdmmSLIM" else 2e-3
    if model == "SLIM":
        for m in ("hit@5", "hit@10", "ndcg@5", "ndcg@10"):
            assert ours[m] >= ref[m] - atol, (m, ref, ours)
        # emulate the reference's transposed sparse scoring: must then
        # reproduce its metrics (near-)exactly
        import unirec_tpu.models.solvers as _sv
        orig = _sv.SLIM.solve

        def transposed(self, graph):
            orig(self, graph)
            self.item_similarity = np.ascontiguousarray(
                self.item_similarity.T)

        _sv.SLIM.solve = transposed
        try:
            ours_t = _run_ours(
                root, os.path.join(str(tmp_path), "ours-SLIM-T"),
                model=model, dataloader="AERecDataset",
                n_sample_neg_train=0, exp_name="ours-SLIM-T", **extra)
        finally:
            _sv.SLIM.solve = orig
        for m in ("hit@5", "hit@10", "ndcg@5", "ndcg@10"):
            np.testing.assert_allclose(ours_t[m], ref[m], atol=atol,
                                       err_msg=("SLIM-transposed", m))
        return
    for m in ("hit@5", "hit@10", "ndcg@5", "ndcg@10"):
        np.testing.assert_allclose(ours[m], ref[m], atol=atol,
                                   err_msg=(model, m))


_SEQ_COMMON = {"loss_type": "fullsoftmax", "n_sample_neg_train": 0,
               "history_mask_mode": "autoregressive", "max_seq_len": 10,
               "hidden_size": 32}


@pytest.mark.parametrize("model,loader,extra", [
    ("GRU", "SeqRecDataset", dict(_SEQ_COMMON)),
    ("MultiVAE", "AERecDataset", {"n_sample_neg_train": 0}),
    ("ConvFormer", "SeqRecDataset",
     dict(_SEQ_COMMON, conv_size=4, n_layers=1)),
    ("FASTConvFormer", "SeqRecDataset",
     dict(_SEQ_COMMON, conv_size=4, n_layers=1)),
    ("SVDPlusPlus", "SeqRecDataset", dict(_SEQ_COMMON, has_user_emb=1)),
    ("AvgHist", "SeqRecDataset", dict(_SEQ_COMMON)),
    ("AttHist", "SeqRecDataset", dict(_SEQ_COMMON)),
])
def test_other_models_match_reference(reference_env, synth_dataset, tmp_path,
                                      model, loader, extra):
    """GRU (flax RNN vs torch GRU math) and MultiVAE pipeline parity."""
    root, info = synth_dataset
    common = dict(model=model, dataloader=loader, epochs=6,
                  learning_rate=0.005, **extra)
    ref_extra = {k: v for k, v in common.items() if k != "hidden_size" or
                 model == "GRU"}
    ref = _run_reference(reference_env, root,
                         os.path.join(str(tmp_path), f"ref-{model}"),
                         exp_name=f"ref-{model}", **ref_extra)
    ours_extra = {k: v for k, v in common.items()
                  if k not in ("history_mask_mode",)}
    ours = _run_ours(root, os.path.join(str(tmp_path), f"ours-{model}"),
                     exp_name=f"ours-{model}", **ours_extra)
    for m in ("hit@5", "ndcg@5"):
        assert ours[m] >= ref[m] - 0.05, (model, m, ref, ours)


# ---------------------------------------------------------------- ranking
_RANK_COMMON = {
    "n_sample_neg_train": 0, "valid_protocol": "one_vs_k",
    "test_protocol": "one_vs_k", "metrics": "['auc','group_auc']",
    "key_metric": "auc", "loss_type": "bce", "embedding_size": 32,
    "hidden_size": 32, "max_seq_len": 10, "n_layers": 1, "n_heads": 2,
    "inner_size": 64, "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
    "grad_clip_value": 10, "group_size": -1, "init_std": 0.1,
    "data_train_name": "rank_train", "data_valid_name": "rank_valid",
    "data_test_name": "rank_test", "epochs": 12, "learning_rate": 0.005,
}


@pytest.mark.parametrize("model,extra", [
    ("FM", dict(dataloader="RankDataset", dataset="synthfm", group_size=6,
                data_train_name="libfm_train", data_valid_name="libfm_valid",
                data_test_name="libfm_test", learning_rate=0.05, epochs=8)),
    ("BST", dict(dataloader="SeqRecDataset", dataset="synthrank")),
    ("AdaRanker", dict(dataloader="SeqRecDataset", dataset="synthrank",
                       train_type="Base", base_model="GRU",
                       use_pre_item_emb=0, learning_rate=0.01)),
    ("AdaRanker", dict(dataloader="SeqRecDataset", dataset="synthrank",
                       train_type="Ada-Ranker", base_model="GRU",
                       use_pre_item_emb=0, learning_rate=0.01)),
    # apples-to-apples Ada mode: ours runs with ada_reference_init=1 so
    # BOTH frameworks use the reference's zero-centered modulation inits
    # (closing the only init deviation; see models/rank.py setup comment)
    ("AdaRanker", dict(dataloader="SeqRecDataset", dataset="synthrank",
                       train_type="Ada-Ranker", base_model="GRU",
                       use_pre_item_emb=0, learning_rate=0.01,
                       ada_reference_init=1, epochs=6)),
])
def test_rank_models_match_reference(reference_env, synth_dataset, tmp_path,
                                     model, extra):
    """Ranking-family pipeline parity (FM on T7 libFM groups, BST and
    AdaRanker on T4 grouped rows), reference run with the sklearn float-AUC
    shim. Note: with the reference's zero-centered modulation inits, its
    Ada-Ranker train_type never escapes AUC≈0.5 on this tiny dataset (our
    identity-centered init does — see models/rank.py); the Base train_type
    case is the one where both frameworks genuinely learn (ref AUC≈0.91)."""
    root, info = synth_dataset
    common = dict(_RANK_COMMON, **extra)
    # ada_reference_init is OUR flag (it makes our inits match the
    # reference's defaults); the reference never sees it
    ref_init = common.pop("ada_reference_init", 0)
    tag = f"{model}-{extra.get('train_type', 'na')}" + (
        "-refinit" if ref_init else "")
    ref = _run_reference(reference_env, root,
                         os.path.join(str(tmp_path), f"ref-{tag}"),
                         model=model, exp_name=f"ref-{tag}",
                         history_mask_mode="autoregressive", **common)
    ours_conf = {k: v for k, v in common.items() if k != "dataset"}
    fmt = ("label-index_group-value_group" if model == "FM"
           else "user-item_group-label_group")
    ours = _run_ours(root, os.path.join(str(tmp_path), f"ours-{tag}"),
                     model=model, exp_name=f"ours-{tag}",
                     train_file_format=fmt, valid_file_format=fmt,
                     test_file_format=fmt, ada_reference_init=ref_init,
                     **ours_conf)
    for m in ("auc", "group_auc"):
        assert ours[m] >= ref[m] - 0.05, (tag, m, ref, ours)
    # where the reference learns, we must genuinely learn too
    if ref["auc"] > 0.6:
        assert ours["auc"] > 0.75, (tag, ref, ours)
