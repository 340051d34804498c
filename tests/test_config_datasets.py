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
