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


def test_t1_1_explicit_max_len(synth_dataset, tmp_path):
    """T1_1 (user-item-max_len) rows truncate the history to the explicit
    per-row prefix length (adduserhistory.py:59-62 / history.py explicit
    path) — the reference's continual-training format."""
    import numpy as np
    import pandas as pd
    root, info = synth_dataset
    hist = pd.read_pickle(os.path.join(root, "user_history.pkl"))
    rows = []
    rng = np.random.default_rng(5)
    for u, seq in zip(hist.user_id, hist.item_seq):
        n = int(rng.integers(2, len(seq)))
        rows.append((u, int(seq[n]) if n < len(seq) else int(seq[-1]), n))
    t11 = os.path.join(root, "t11_train.pkl")
    pd.DataFrame(rows, columns=["user_id", "item_id", "max_len"]).to_pickle(t11)

    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                loss_type="fullsoftmax", n_sample_neg_train=0, n_layers=1,
                epochs=4, learning_rate=0.005, hidden_dropout_prob=0.1,
                attn_dropout_prob=0.1,
                data_train_name="t11_train",
                train_file_format="user-item-max_len",
                dataset_path=root, task="train",
                output_path=os.path.join(str(tmp_path), "t11"))
    result = main.run(conf)
    assert result is not None and result["hit@5"] > 5.0 / 300.0, result

    # window semantics: explicit max_len wins over occurrence search
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils import file_io
    h = UserHistory.from_dataframe(
        file_io.load_table(os.path.join(root, "user_history")), 201,
        "user-item_seq")
    seq, slen, _ = h.sequence_batch(
        np.array([1, 2]), np.array([5, 7]), 6, mask_mode="autoregressive",
        explicit_max_len=np.array([3, 10]))
    assert slen[0] == 3 and slen[1] == 6
    assert (seq[0][:3] == 0).all()  # left padding for the short prefix


def test_session_gmv_metrics_e2e(synth_dataset, tmp_path):
    """GMV/price-weighted session metrics flow end-to-end: prices come from
    item_meta_morec.csv's weight column keyed by each row's item_id
    (reference evaluator_abc.py:145-169 + sessionwise.py:39-83)."""
    root, info = synth_dataset
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True, n_sample_neg_train=9, epochs=3,
                data_test_name="test_session",
                test_file_format="user-item-label-session",
                test_protocol="session_aware",
                metrics="['group_auc','ndcg','rndcg','rndcg@3',"
                        "'rhit@3','rrecall@3','hit@3','recall@3']",
                key_metric="ndcg",
                dataset_path=root, task="train",
                output_path=os.path.join(str(tmp_path), "gmv"),
                exp_name="gmv")
    result = main.run(conf)
    assert result is not None
    for m in ("rndcg", "rndcg@3", "rhit@3", "rrecall@3"):
        assert m in result, result.keys()
    assert 0 < result["rndcg"] <= 1.0
    assert 0 < result["rndcg@3"] <= 1.0
    # synth prices are in [1, 50]: a price-weighted hit must dominate the
    # 0/1 hit and the rrecall mass must exceed plain recall
    assert result["rhit@3"] >= result["hit@3"]
    assert result["rrecall@3"] >= result["recall@3"]
