"""Golden dress rehearsal for the RANKING family (FM / BST / AdaRanker) —
the reference's published rank baseline run end-to-end against the actual
reference, at ml-100k scale, using the REFERENCE'S OWN preprocessing.

The reference's rank goldens (tests/test_model/test_rank_model.py:69-73:
FM auc 0.816, BST 0.851, AdaRanker 0.828 on ml-100k-libfm/-rank/-adaranker,
20 epochs, seed 2023) depend on a three-stage preprocessing chain:
download_split_ml100k.prepare_ml100k -> specific_datasets/ranker.main
(libfm/rank/adaranker raw generators with static negatives) ->
prepare_data.process_transaction_dataset. With no network egress the real
archive is unreachable, so this rehearsal plants an ml-100k-shaped
synthetic zip (tests/synth.py::gen_ml100k_shaped) where the reference's
downloader looks and runs that chain UNMODIFIED — every artifact both
frameworks consume is produced by the reference's own converters. Then
both frameworks train with the published GLOBAL_CONF and ours must match
or beat the reference within 0.05 AUC (far tighter than the goldens' own
0.2 tolerance).

This doubles as a format-compatibility proof: our T4/T7 rank pipelines
read the reference's processed .ftr/.pkl artifacts directly.

Default run covers FM (the cheapest); UNIREC_REHEARSAL_FULL=1 adds BST
and AdaRanker (torch-CPU transformer runs, several minutes each).

Note: both frameworks run with history_mask_mode='autoregressive' — the
reference's own test config misspells it 'autoagressive', silently
disabling target masking (see test_reference_e2e.py).
"""
import copy
import json
import os
import shutil
import zipfile

import pytest

pytestmark = pytest.mark.rehearsal

REFERENCE = "/root/reference"

GOLDEN = {  # the published goldens, for context only (real data)
    "FM": {"auc": 0.81613, "group_auc": 0.79453},
    "BST": {"auc": 0.85084, "group_auc": 0.83397},
    "AdaRanker": {"auc": 0.82794, "group_auc": 0.78692},
}
TOL = 0.05

# reference GLOBAL_CONF (test_rank_model.py:21-66), shared by both sides
RANK_CONF = {
    "learning_rate": 0.0008787070324991168,
    "use_pre_item_emb": 0,
    "loss_type": "bce",
    "optimizer": "adam",
    "has_user_bias": 0,
    "has_item_bias": 0,
    "epochs": 20,
    "batch_size": 1024,
    "n_sample_neg_train": 0,
    "valid_protocol": "one_vs_k",
    "test_protocol": "one_vs_k",
    "grad_clip_value": 10,
    "user_history_filename": "user_history",
    "user_history_file_format": "user-item_seq",
    "history_mask_mode": "autoregressive",
    "group_size": -1,
    "metrics": "['auc','group_auc']",
    "key_metric": "auc",
    "shuffle_train": 1,
    "early_stop": 5,
    "embedding_size": 32,
    "neg_by_pop_alpha": 0.0,
    "scheduler_factor": 0.5,
    "n_layers": 3,
    "n_heads": 8,
    "inner_size": 64,
    "hidden_dropout_prob": 0.11175639972166328,
    "attn_dropout_prob": 0.22652963648975333,
    "max_seq_len": 10,
    "seed": 2023,
}

MODEL2DATASET = {"FM": "ml-100k-libfm", "BST": "ml-100k-rank",
                 "AdaRanker": "ml-100k-adaranker"}
MODEL2DATALOADER = {"FM": "RankDataset", "BST": "SeqRecDataset",
                    "AdaRanker": "SeqRecDataset"}
MODEL2EXTRA = {
    "FM": {},
    "BST": {},
    "AdaRanker": {"base_model": "GRU", "train_type": "Ada-Ranker"},
    # same model, reference's non-adaptive training mode (train_type
    # dispatch at reference unirec/model/rank/adaranker.py) — recorded so
    # the Ada vs Base delta is visible in the evidence table
    "AdaRanker-Base": {"base_model": "GRU", "train_type": "Base"},
}
MODEL2NAME = {m: m.split("-")[0] for m in MODEL2EXTRA}
MODEL2DATASET["AdaRanker-Base"] = MODEL2DATASET["AdaRanker"]
MODEL2DATALOADER["AdaRanker-Base"] = MODEL2DATALOADER["AdaRanker"]
_FULL = bool(os.environ.get("UNIREC_REHEARSAL_FULL"))
MODELS = ["FM", "BST", "AdaRanker", "AdaRanker-Base"] if _FULL else ["FM"]
# The torch reference needs ~5 CPU-minutes PER EPOCH on the 1.3M-row libfm
# train set, so the default budget is 3 epochs — mutual parity at an
# equal epoch budget is the claim under test. UNIREC_REHEARSAL_EPOCHS
# overrides (the published golden budget is 20).
RANK_CONF = dict(RANK_CONF, epochs=int(
    os.environ.get("UNIREC_REHEARSAL_EPOCHS", 3)))


def _txt_cfg(split_cols):
    """The per-file keys process_transaction_dataset expects for the
    ranker converter's space-separated txt output
    (reference tests/test_dataset/test_preprocess.py:95-270)."""
    cfg = {"sep": " ", "gen_text_emb": 0}
    for split, (fmt, cols) in split_cols.items():
        cfg[f"{split}_file"] = f"{split}.txt"
        cfg[f"{split}_file_format"] = fmt
        cfg[f"{split}_file_has_header"] = 0
        cfg[f"{split}_file_col_names"] = cols
        if split != "user_history":
            cfg[f"{split}_neg_k"] = 0
    return cfg


@pytest.fixture(scope="module")
def rank_datasets(tmp_path_factory):
    from tests.refshim import _stub, setup_reference_shims
    from tests.synth import gen_ml100k_shaped

    setup_reference_shims()
    # ranker.py imports gensim at module top; pretrain_word2vec stays 0
    import sys
    if "gensim" not in sys.modules:
        _stub("gensim")
        _stub("gensim.models", {"Word2Vec": object})
    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            _stub("tqdm", {"tqdm": lambda x, **k: x})

    # plant the synthetic raw archive where prepare_ml100k looks
    home_ds = os.path.expanduser("~/.unirec/dataset")
    os.makedirs(home_ds, exist_ok=True)
    raw = str(tmp_path_factory.mktemp("raw"))
    gen_ml100k_shaped(raw)
    with zipfile.ZipFile(os.path.join(home_ds, "ml-100k.zip"), "w") as z:
        z.write(os.path.join(raw, "u.data"), "ml-100k/u.data")
        z.write(os.path.join(raw, "u.item"), "ml-100k/u.item")
    for stale in ("ml-100k", "ml-100k-libfm", "ml-100k-rank",
                  "ml-100k-adaranker"):
        shutil.rmtree(os.path.join(home_ds, stale), ignore_errors=True)

    from examples.preprocess.download_split_ml100k import prepare_ml100k
    from examples.preprocess.prepare_data import process_transaction_dataset
    from examples.preprocess.specific_datasets import ranker

    assert prepare_ml100k()

    outroot = str(tmp_path_factory.mktemp("data"))
    rawroot = str(tmp_path_factory.mktemp("rawsets"))
    base_pre = {
        "prefile": os.path.join(home_ds, "ml-100k", "user_history.csv"),
        "infile_dir": home_ds, "n_neg_k": 20, "sep": "\t",
        "prefile_file_format": "user-item_seq", "pretrain_word2vec": 0,
        "embedding_size": 64, "item2cate_file": None,
    }
    base_cfg = {
        "outpathroot": outroot,
        "example_yaml_file": os.path.join(
            REFERENCE, "unirec", "config", "dataset", "example.yaml"),
        "index_by_zero": 0, "text_emb_size": 1024,
    }
    grp = ("user-item_group-label_group",
           "['user_id', 'item_id_list', 'label_list']")
    fm = ("label-index_group-value_group",
          "['label', 'index_list', 'value_list']")
    hist = ("user-item_seq", "['user_id', 'item_seq']")
    for ds, fmt, extra, cols in (
            ("ml-100k-libfm", "libfm", {}, fm),
            ("ml-100k-rank", "rank", {}, grp),
            ("ml-100k-adaranker", "adaranker",
             {"item2cate_file": os.path.join(home_ds, "ml-100k",
                                             "item2cate.json"),
              "n_neg_k": 11}, grp)):
        pre = dict(base_pre, data_format=fmt,
                   infile=os.path.join(home_ds, ds, f"{ds}.txt"),
                   outdir=os.path.join(rawroot, ds), **extra)
        os.makedirs(os.path.join(home_ds, ds), exist_ok=True)
        ranker.main(pre)
        cfg = dict(base_cfg, dataset_name=ds,
                   raw_datapath=os.path.join(rawroot, ds),
                   **_txt_cfg({"train": cols, "valid": cols, "test": cols,
                               "user_history": hist}))
        process_transaction_dataset(cfg)

    # writable reference config dir with the synthetic counts
    cfg_dir = str(tmp_path_factory.mktemp("refcfg"))
    shutil.copytree(os.path.join(REFERENCE, "unirec", "config"), cfg_dir,
                    dirs_exist_ok=True)
    infos = {}
    for ds in MODEL2DATASET.values():
        with open(os.path.join(outroot, ds, "data.info")) as f:
            info = json.load(f)
        # the libFM feature count lives in the ranker converter's
        # raw_data.info, not the processed data.info (the reference carries
        # it via its checked-in dataset yaml, ml-100k-libfm.yaml:2)
        raw_info_path = os.path.join(rawroot, ds, "raw_data.info")
        if os.path.exists(raw_info_path):
            with open(raw_info_path) as f:
                for k, v in json.load(f).items():
                    info.setdefault(k, v)
        infos[ds] = info
        y = [f"group_size: -1\nn_users: {info['n_users']}\n"
             f"n_items: {info['n_items']}\n"
             "n_neg_test_from_sampling: 0\nn_neg_train_from_sampling: 0\n"
             "n_neg_valid_from_sampling: 0\n"]
        if "n_feats" in info:
            y.append(f"n_feats: {info['n_feats']}\n")
        fmt = (fm if ds == "ml-100k-libfm" else grp)[0]
        y.append(f"train_file_format: {fmt}\nvalid_file_format: {fmt}\n"
                 f"test_file_format: {fmt}\n"
                 "user_history_file_format: user-item_seq\n")
        with open(os.path.join(cfg_dir, "dataset", f"{ds}.yaml"), "w") as f:
            f.write("".join(y))
    return outroot, cfg_dir, infos


def _record(case, side, metrics):
    """Append one evidence line when UNIREC_REHEARSAL_RECORD names a file —
    used to persist the 20-epoch published-budget run for docs/evidence."""
    path = os.environ.get("UNIREC_REHEARSAL_RECORD")
    if not path:
        return
    with open(path, "a") as f:
        f.write(json.dumps({
            "case": case, "side": side, "epochs": RANK_CONF["epochs"],
            "metrics": metrics}) + "\n")
        f.flush()


def _run_reference(cfg_dir, outroot, out_dir, model):
    from unirec.main import main as refmain
    ds = MODEL2DATASET[model]
    args = dict(RANK_CONF)
    args.update({
        "config_dir": cfg_dir, "exp_name": f"ref-{model}",
        "model": MODEL2NAME[model],
        "dataloader": MODEL2DATALOADER[model], "dataset": ds,
        # the reference's own tests join dataset_path with the dataset name
        # before calling run (test_rank_model.py:102)
        "dataset_path": os.path.join(outroot, ds), "output_path": out_dir,
        "task": "train", "gpu_id": -1, "use_wandb": 0, "use_tensorboard": 0,
        "num_workers": 0, "num_workers_test": 0, "verbose": 2,
    })
    args.update(MODEL2EXTRA[model])
    out = {k: float(v) for k, v in refmain.run(args).items()}
    _record(model, "reference", out)
    return out


def _run_ours(outroot, infos, out_dir, model):
    from unirec_tpu.main import main
    ds = MODEL2DATASET[model]
    conf = dict(RANK_CONF)
    fmt = ("label-index_group-value_group" if model == "FM"
           else "user-item_group-label_group")
    conf.update(
        model=MODEL2NAME[model], dataloader=MODEL2DATALOADER[model],
        dataset=ds,
        dataset_path=os.path.join(outroot, ds), output_path=out_dir,
        exp_name=f"ours-{model}", task="train", verbose=1,
        train_file_format=fmt, valid_file_format=fmt, test_file_format=fmt,
        n_users=infos[ds]["n_users"], n_items=infos[ds]["n_items"],
        **MODEL2EXTRA[model])
    if "n_feats" in infos[ds]:
        conf["n_feats"] = infos[ds]["n_feats"]
    out = {k: float(v) for k, v in main.run(conf).items()}
    _record(model, "ours", out)
    return out


@pytest.mark.parametrize("model", MODELS)
def test_rank_golden_rehearsal(rank_datasets, tmp_path, model):
    outroot, cfg_dir, infos = rank_datasets
    ref = _run_reference(cfg_dir, outroot,
                         os.path.join(str(tmp_path), f"ref-{model}"), model)
    ours = _run_ours(outroot, infos,
                     os.path.join(str(tmp_path), f"ours-{model}"), model)
    import math
    # FM demonstrably learns within the default 3-epoch budget (ref auc
    # 0.72); BST/AdaRanker need the published 20-epoch budget to beat
    # random on this data — at reduced budgets their case asserts mutual
    # pipeline parity only (both frameworks in the same band), like the
    # MultiVAE seq-rehearsal case
    if model == "FM" or RANK_CONF["epochs"] >= 20:
        # the run must be meaningful: at least one framework demonstrably
        # learns. Recorded 20-epoch result (docs/evidence/
        # rank_rehearsal_r5.md): the REFERENCE's Ada-Ranker train_type
        # itself fails to learn on this fixture (auc 0.5000, while its own
        # Base mode reaches 0.6015) — ours reaches 0.6022 in Ada mode, so
        # gating on ref alone would fail the test for beating the
        # reference.
        assert max(ref["auc"], ours["auc"]) > 0.55, (model, ref, ours)
    for m in ("auc", "group_auc"):
        assert math.isfinite(ours[m]), (model, m, ours)
        if math.isfinite(ref[m]):  # the reference's group_auc can be nan
            assert ours[m] >= ref[m] - TOL, (model, m, ref, ours)
