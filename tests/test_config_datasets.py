"""Packaged dataset-config layer (reference unirec/config/dataset/*.yaml).

The 5-layer merge (config/__init__.py) resolves `--dataset <name>` against
the packaged metadata yamls; CLI/caller args still win (priority documented
at reference main.py:440-442)."""
import os

import pytest

from unirec_tpu import config as config_mod

_DSET_DIR = os.path.join(os.path.dirname(config_mod.__file__), "dataset")


def test_packaged_dataset_surface_complete():
    names = {f[:-5] for f in os.listdir(_DSET_DIR) if f.endswith(".yaml")}
    # the reference's public-benchmark + workflow surface
    for required in ("ml-100k", "ml-100k-libfm", "ml-100k-rank",
                     "ml-100k-adaranker", "ml-100k-max_len", "Beauty",
                     "Beauty-libfm", "Steam", "amazon-book", "yelp2018",
                     "DE_final_dataset", "UK_final_next_item_dataset"):
        assert required in names, required
    assert len(names) >= 30


@pytest.mark.parametrize("name,n_users,n_items,fmt", [
    ("ml-100k", 940, 1017, "user-item"),
    ("Beauty", 22364, 12102, "user-item"),
    ("ml-100k-rank", 940, 1017, "user-item_group-label_group"),
    ("ml-100k-libfm", 940, 1017, "label-index_group-value_group"),
])
def test_dataset_yaml_merge(name, n_users, n_items, fmt):
    cfg = config_mod.parse_arguments({"model": "MF", "dataset": name},
                                     argv=[])
    assert cfg["n_users"] == n_users
    assert cfg["n_items"] == n_items
    assert cfg["train_file_format"] == fmt


def test_caller_args_beat_dataset_yaml():
    cfg = config_mod.parse_arguments(
        {"model": "MF", "dataset": "ml-100k", "n_items": 7}, argv=[])
    assert cfg["n_items"] == 7  # caller dict is the highest-priority layer


def test_feat_counts_present_for_libfm():
    cfg = config_mod.parse_arguments({"model": "FM",
                                      "dataset": "Beauty-libfm"}, argv=[])
    assert cfg["n_feats"] == 46557


def test_tpu_fast_defaults(monkeypatch):
    """On a TPU backend, compute_dtype defaults to bfloat16; an explicit
    setting from any layer wins; --reproducible restores the portable path
    wholesale (VERDICT r3 item 7)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = config_mod.parse_arguments({"model": "SASRec"}, argv=[])
    assert cfg["compute_dtype"] == "bfloat16"

    cfg = config_mod.parse_arguments({"model": "SASRec"},
                                     argv=["--compute_dtype", "float32"])
    assert cfg["compute_dtype"] == "float32"  # explicit CLI layer wins

    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cfg = config_mod.parse_arguments(
            {"model": "SASRec", "dropout_rng_impl": "rbg",
             "dropout_bits": 8},
            argv=["--reproducible", "1"])
    assert cfg["compute_dtype"] == "float32"
    assert cfg["dropout_rng_impl"] == "threefry"
    assert cfg["dropout_bits"] == 32
    # the override of explicitly-set rng flags must be loud (r4 advisor)
    msgs = [str(w.message) for w in rec]
    assert any("--reproducible overrides" in m and "dropout_rng_impl" in m
               for m in msgs), msgs

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        config_mod.parse_arguments({"model": "SASRec"},
                                   argv=["--reproducible", "1"])
    assert not [m for m in rec
                if "--reproducible overrides" in str(m.message)]


def test_cpu_backend_keeps_f32_default():
    cfg = config_mod.parse_arguments({"model": "SASRec"}, argv=[])
    assert cfg["compute_dtype"] == "float32"  # suite runs on the CPU mesh
