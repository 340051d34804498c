"""Sequential-family end-to-end tests (mirrors the reference
tests/test_model/test_seq_model.py strategy: every sequential model trains
through main.run and must clearly beat the random one-vs-all baseline;
SASRec additionally exercises every loss type and the text-embedding path)."""
import copy
import os

import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main

RANDOM_HIT5 = 5.0 / 300.0

SEQ_CONF = {
    "dataloader": "SeqRecDataset",
    "loss_type": "fullsoftmax",
    "n_sample_neg_train": 0,
    "epochs": 6,
    "learning_rate": 0.005,
    "hidden_dropout_prob": 0.1,
    "attn_dropout_prob": 0.1,
    "n_layers": 1,
    "n_heads": 2,
    "inner_size": 64,
    "conv_size": 4,
}


def _conf(root, tmp, model, **kw):
    conf = copy.deepcopy(BASE_CONF)
    conf.update(SEQ_CONF)
    conf.update(model=model, dataset_path=root, task="train",
                output_path=os.path.join(tmp, model))
    conf.update(kw)
    return conf


@pytest.mark.parametrize("model", ["SASRec", "GRU", "AvgHist", "AttHist",
                                   "SVDPlusPlus", "ConvFormer",
                                   "FASTConvFormer"])
def test_seq_model(synth_dataset, tmp_path, model):
    root, info = synth_dataset
    kw = {}
    if model == "SVDPlusPlus":
        kw["has_user_emb"] = True
    result = main.run(_conf(root, str(tmp_path), model, **kw))
    assert result is not None
    assert result["hit@5"] > 2 * RANDOM_HIT5, (model, result)
    assert result["hit@5"] <= result["hit@10"]


@pytest.mark.parametrize("loss", ["bce", "bpr", "softmax", "ccl", "fullsoftmax"])
def test_sasrec_losses(synth_dataset, tmp_path, loss):
    root, info = synth_dataset
    neg = 0 if loss == "fullsoftmax" else 9
    # sampled losses see 10 candidates/row instead of the catalog; give them
    # more epochs to clear the bar on the tiny synth set
    result = main.run(_conf(root, str(tmp_path), "SASRec", loss_type=loss,
                            n_sample_neg_train=neg,
                            epochs=6 if loss == "fullsoftmax" else 10,
                            exp_name=f"pytest-{loss}"))
    assert result["hit@5"] > 1.5 * RANDOM_HIT5, (loss, result)


def test_sasrec_text_emb(synth_dataset, tmp_path):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path), "SASRec",
                            use_text_emb=True, text_emb_size=24,
                            text_emb_path=os.path.join(root, "text_emb.tsv"),
                            exp_name="pytest-textemb"))
    assert result["hit@5"] > 2 * RANDOM_HIT5, result
