"""Multi-positive (T5) one-vs-all evaluation and the categorical-features
path (reference test_seq_model.py:125-160 features/text coverage +
multipos.py evaluation)."""
import copy
import os

import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main


def test_multipos_evaluation(synth_dataset, tmp_path):
    """T5 eval file (2 positives per user) routes to the
    MultiPositiveEvaluator; recall@k <= hit@k and metrics are sane."""
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, dataset_path=root, task="train", epochs=3,
                output_path=os.path.join(str(tmp_path), "mp"),
                data_test_name="test_multipos",
                test_file_format="user-item_seq",
                metrics="['hit@5;10','recall@5;10','ndcg@5;10','mrr@5']",
                key_metric="ndcg@5")
    result = main.run(conf)
    assert result is not None
    assert result["hit@5"] >= result["recall@5"] > 0, result
    assert result["hit@5"] > 2 * 5.0 / 300.0
    for v in result.values():
        assert 0 <= v <= 1


def test_sasrec_with_features(synth_dataset, tmp_path):
    """use_features adds the per-item categorical embedding to both the
    candidate and sequence towers (reco_abc.py:182-185). The feature here is
    the planted cluster id, so it should help, not hurt."""
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                loss_type="fullsoftmax", n_sample_neg_train=0, n_layers=1,
                epochs=6, learning_rate=0.005, hidden_dropout_prob=0.1,
                attn_dropout_prob=0.1,
                use_features=1,
                features_filepath=os.path.join(root, "item_features.pkl"),
                features_shape="[7]",
                dataset_path=root, task="train",
                output_path=os.path.join(str(tmp_path), "feat"))
    result = main.run(conf)
    assert result is not None
    assert result["hit@5"] > 2 * 5.0 / 300.0, result
