"""Serving export roundtrip: checkpoint → StableHLO artifacts → client
(capability parity with the reference's ONNX export + validation,
torch2onnx.py:30-90, examples/serving/)."""
import copy
import os

import numpy as np
import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import main


@pytest.fixture(scope="module")
def sasrec_ckpt(synth_dataset, tmp_path_factory):
    root, info = synth_dataset
    out = str(tmp_path_factory.mktemp("exportckpt"))
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                loss_type="fullsoftmax", n_sample_neg_train=0, n_layers=1,
                dataset_path=root, output_path=out, task="train", epochs=2,
                exp_name="exp")
    main.run(conf)
    return os.path.join(out, "checkpoint", "exp.pkl")


def test_export_and_serve_roundtrip(sasrec_ckpt, tmp_path):
    from unirec_tpu.serving.export import ServingModel, export_model
    out_dir = os.path.join(str(tmp_path), "artifact")
    manifest = export_model(sasrec_ckpt, out_dir)  # includes atol validation
    assert set(manifest["functions"]) == {"user_emb", "item_emb", "score"}
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))

    serving = ServingModel(out_dir)
    L = manifest["max_seq_len"]
    rng = np.random.default_rng(1)
    B = 6
    seq = rng.integers(1, 300, size=(B, L)).astype(np.int32)
    emb = serving.user_emb(np.arange(1, B + 1), seq, np.full(B, L))
    assert emb.shape == (B, manifest["embedding_size"])
    items = serving.item_emb(np.arange(1, B + 1))
    assert items.shape == (B, manifest["embedding_size"])
    scores = serving.score(np.arange(1, B + 1), seq, np.full(B, L),
                           rng.integers(1, 300, size=(B, 32)).astype(np.int32))
    assert scores.shape == (B, 32)
    assert np.isfinite(scores).all()
