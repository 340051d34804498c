"""Ranking-family end-to-end tests (mirrors the reference
tests/test_model/test_rank_model.py strategy: train through main.run with
AUC assertions on planted-structure data where same-cluster pairs are
positive — easily separable, so any working ranker clears auc > 0.65)."""
import copy
import os

import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main

RANK_CONF = {
    "loss_type": "bce",
    "epochs": 15,
    "batch_size": 256,
    "n_sample_neg_train": 0,
    "valid_protocol": "one_vs_k",
    "test_protocol": "one_vs_k",
    "metrics": "['auc', 'group_auc']",
    "key_metric": "auc",
    "learning_rate": 0.005,
    "grad_clip_value": 5.0,
    # tiny-synth plateau escape is fragile with the reference's 0.02 init;
    # a larger initial embedding signal makes all three rankers learn
    # reliably regardless of the shuffle stream
    "init_std": 0.1,
    "embedding_size": 32,
    "hidden_size": 32,
    "max_seq_len": 10,
    "n_layers": 1,
    "n_heads": 2,
    "inner_size": 64,
    "hidden_dropout_prob": 0.1,
    "attn_dropout_prob": 0.1,
    "group_size": -1,
}


def _conf(root, tmp, model, **kw):
    conf = copy.deepcopy(BASE_CONF)
    conf.update(RANK_CONF)
    conf.update(model=model, dataset_path=root, task="train",
                output_path=os.path.join(tmp, model),
                data_train_name="rank_train", data_valid_name="rank_valid",
                data_test_name="rank_test",
                train_file_format="user-item_group-label_group",
                valid_file_format="user-item_group-label_group",
                test_file_format="user-item_group-label_group",
                dataloader="SeqRecDataset")
    conf.update(kw)
    return conf


def test_fm(synth_dataset, tmp_path):
    root, info = synth_dataset
    conf = _conf(root, str(tmp_path), "FM",
                 dataloader="RankDataset", group_size=6,
                 data_train_name="libfm_train", data_valid_name="libfm_valid",
                 data_test_name="libfm_test",
                 train_file_format="label-index_group-value_group",
                 valid_file_format="label-index_group-value_group",
                 test_file_format="label-index_group-value_group",
                 epochs=8, learning_rate=0.05)
    result = main.run(conf)
    assert result["auc"] > 0.65, result
    assert result["group_auc"] > 0.6, result


def test_bst(synth_dataset, tmp_path):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path), "BST"))
    assert result["auc"] > 0.65, result
    assert result["group_auc"] > 0.6, result


@pytest.mark.parametrize("train_type,base", [("Ada-Ranker", "GRU"),
                                             ("Base", "GRU"),
                                             ("Ada-Ranker", "SASRec")])
def test_adaranker(synth_dataset, tmp_path, train_type, base):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path),
                            "AdaRanker", train_type=train_type,
                            base_model=base, learning_rate=0.01,
                            exp_name=f"pytest-{train_type}-{base}"))
    assert result["auc"] > 0.65, (train_type, base, result)
