"""End-to-end CF pipelines on the synthetic dataset (mirrors the reference
tests/test_model/test_cf_model.py strategy: full train→valid→test through
main.run with metric assertions). Random-baseline hit@5 ≈ 5/300 ≈ 0.017; the
planted cluster structure lets even 3-epoch models clear 3-4× that."""
import copy
import os

import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main


def _conf(root, tmp, model, **kw):
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model=model, dataset_path=root,
                output_path=os.path.join(tmp, model), task="train")
    conf.update(kw)
    return conf


def test_mf_train_pipeline(synth_dataset, tmp_path):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path), "MF", loss_type="bpr",
                            dataloader="BaseDataset", has_user_emb=True))
    assert result is not None
    assert result["hit@5"] > 0.05, result
    assert result["ndcg@5"] > 0.02, result
    assert 0 <= result["hit@5"] <= 1 and result["hit@5"] <= result["hit@10"]


def test_mf_all_losses(synth_dataset, tmp_path):
    root, info = synth_dataset
    for loss in ("bce", "bpr", "ccl", "softmax", "fullsoftmax"):
        result = main.run(_conf(root, str(tmp_path), "MF", loss_type=loss,
                                dataloader="BaseDataset", has_user_emb=True,
                                epochs=5, learning_rate=0.01,
                                exp_name=f"pytest-{loss}"))
        assert result["hit@5"] > 0.03, (loss, result)


def test_multivae(synth_dataset, tmp_path):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path), "MultiVAE",
                            dataloader="AERecDataset", epochs=5,
                            embedding_size=64, encoder_dims=[32],
                            decoder_dims=[32], learning_rate=0.003))
    # the reference's own MultiVAE golden is barely above random after a few
    # epochs (test_cf_model.py:61: hit@5=0.01065); require clear learning at @10
    assert result["hit@10"] > 0.03, result


def test_multivae_kl_anneal_schedule(synth_dataset, tmp_path, monkeypatch):
    """The KL anneal factor the train step actually receives must follow
    the reference recurrence (multivae.py:25,106-109): anneal starts at
    0.0 and is bumped by 1/total_anneal_steps after each forward, capped
    at anneal_cap — i.e. the value used at 0-based step k is
    min(cap, k/total)."""
    import numpy as np

    import unirec_tpu.facility.trainer as trmod

    seen = []
    orig_build = trmod.Trainer._build_train_step

    def patched(self):
        orig_build(self)
        inner = self._train_step

        def spy(params, opt_state, step_idx, batch, rng):
            seen.append(float(np.asarray(batch["anneal"])))
            return inner(params, opt_state, step_idx, batch, rng)

        self._train_step = spy

    monkeypatch.setattr(trmod.Trainer, "_build_train_step", patched)
    root, info = synth_dataset
    cap, total = 0.3, 7.0
    main.run(_conf(root, str(tmp_path), "MultiVAE",
                   dataloader="AERecDataset", epochs=2, batch_size=32,
                   embedding_size=32, encoder_dims=[16], decoder_dims=[16],
                   anneal_cap=cap, total_anneal_steps=total,
                   exp_name="vae-anneal"))
    assert len(seen) >= 10, "expected at least 10 train steps"

    # reference recurrence, simulated verbatim
    ref, want = 0.0, []
    for _ in range(len(seen)):
        want.append(ref)
        ref = min(cap, ref + 1.0 / total)
    np.testing.assert_allclose(seen, want, rtol=0, atol=1e-6)
    assert seen[0] == 0.0 and max(seen) == pytest.approx(cap)


@pytest.mark.parametrize("model", ["EASE", "AdmmSLIM", "SAR", "UserCF", "SLIM"])
def test_solver_models(synth_dataset, tmp_path, model):
    root, info = synth_dataset
    result = main.run(_conf(root, str(tmp_path), model,
                            dataloader="AERecDataset", n_sample_neg_train=0))
    assert result is not None
    assert result["hit@5"] > 0.05, (model, result)
