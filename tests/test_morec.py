"""MoRec multi-objective pipeline tests (mirrors the reference
tests/test_model/test_morec.py strategy: pretrain MF, then finetune with the
MoRec sampler + PID / Static controllers; checks accuracy metrics plus the
revenue/alignment/fairness metric family)."""
import copy
import os

import numpy as np
import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main

MOREC_METRICS = "['hit@5;10', 'ndcg@5;10', 'rhit@5;10', 'rndcg@5;10', 'pop-kl@5;10', 'least-misery']"


def _pretrain(root, tmp):
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", loss_type="bpr",
                has_user_emb=True,
                dataset_path=root, output_path=os.path.join(tmp, "pretrain"),
                task="train", epochs=3, exp_name="morec-pre",
                metrics=MOREC_METRICS, key_metric="ndcg@5")
    result = main.run(conf)
    ckpt = os.path.join(tmp, "pretrain", "checkpoint", "morec-pre.pkl")
    assert os.path.exists(ckpt)
    return conf, ckpt, result


@pytest.mark.parametrize("controller", ["PID", "Static"])
def test_morec_finetune(synth_dataset, tmp_path, controller):
    root, info = synth_dataset
    conf, ckpt, pre = _pretrain(root, str(tmp_path))
    # morec metric keys present on the pretrain eval too
    for key in ("rhit@5", "rndcg@5", "pop-kl@5", "min-hit@5"):
        assert key in pre, pre.keys()
    assert pre["hit@5"] > 0.04

    fconf = dict(conf)
    fconf.update(enable_morec=1, load_pretrained_model=True, model_file=ckpt,
                 output_path=os.path.join(str(tmp_path), f"fine-{controller}"),
                 exp_name=f"morec-fine-{controller}",
                 morec_objectives=["fairness", "alignment", "revenue"],
                 morec_objective_controller=controller,
                 morec_objective_weights="[0.1,0.1,0.1,0.7]" if controller == "Static"
                 else "[0.3,0.3,0.4]",
                 morec_ngroup=5, morec_alpha=0.01, morec_lambda=0.2,
                 morec_expect_loss=0.25, morec_beta_min=0.1,
                 morec_beta_max=1.5, morec_K_p=0.05, morec_K_i=0.001,
                 epochs=3)
    result = main.run(fconf)
    assert result is not None
    # finetuning from the pretrained model should stay in the same accuracy
    # ballpark (reference morec golden keeps hit@5 within ~10% of pretrain)
    assert result["hit@5"] > 0.5 * pre["hit@5"], (pre, result)
    assert np.isfinite(result["pop-kl@5"])
    assert result["min-ndcg@5"] <= result["ndcg@5"] + 1e-9


def test_morec_pareto_controller(synth_dataset, tmp_path):
    """MGDA-based controller path (per-objective gradients via jacrev)."""
    root, info = synth_dataset
    conf, ckpt, pre = _pretrain(root, str(tmp_path))
    fconf = dict(conf)
    fconf.update(enable_morec=1, load_pretrained_model=True, model_file=ckpt,
                 output_path=os.path.join(str(tmp_path), "fine-pareto"),
                 exp_name="morec-fine-pareto",
                 morec_objective_controller="Pareto",
                 morec_ngroup=5, morec_alpha=0.01, epochs=2)
    result = main.run(fconf)
    assert result is not None and result["hit@5"] > 0.25 * pre["hit@5"]
