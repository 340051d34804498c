"""Tests for the serving-side CLIs: infer_embedding, reco_topk, and the
unified cli dispatcher (mirrors the reference's infer-task and embedding
shape tests, test_seq_model.py:264-340)."""
import copy
import os

import jax
import numpy as np
import pytest

from tests.synth import BASE_CONF
from unirec_tpu.main import infer_embedding, main, reco_topk

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (1-chip TPU run)")


@pytest.fixture(scope="module")
def trained_ckpt(synth_dataset, tmp_path_factory):
    root, info = synth_dataset
    out = str(tmp_path_factory.mktemp("ckpt"))
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="SASRec", dataloader="SeqRecDataset",
                loss_type="fullsoftmax", n_sample_neg_train=0,
                n_layers=1, dataset_path=root, output_path=out,
                # f32 even on TPU (bf16 default): the exact-match serving
                # tests below compare near-tied rankings across programs
                compute_dtype="float32",
                task="train", epochs=2, exp_name="clitest")
    main.run(conf)
    return root, os.path.join(out, "checkpoint", "clitest.pkl"), out


def test_infer_embedding_user(trained_ckpt, tmp_path):
    root, ckpt, _ = trained_ckpt
    out_file = os.path.join(str(tmp_path), "user_emb.tsv")
    ids, emb = infer_embedding.run({
        "model_file": ckpt, "dataset_path": root, "node_type": "user",
        "user_history_filename": "user_history",
        "output_emb_file": out_file})
    assert emb.shape == (201, 32)
    assert os.path.exists(out_file)
    first = open(out_file).readline().split("\t")
    assert len(first) == 2 and len(first[1].split(",")) == 32


def test_infer_embedding_item(trained_ckpt, tmp_path):
    root, ckpt, _ = trained_ckpt
    out_file = os.path.join(str(tmp_path), "item_emb.tsv")
    ids, emb = infer_embedding.run({
        "model_file": ckpt, "dataset_path": root, "node_type": "item",
        "output_emb_file": out_file})
    assert emb.shape == (301, 32)
    # padding item 0 embeds to zeros
    assert np.allclose(emb[0], 0.0)


def test_reco_topk(trained_ckpt, tmp_path):
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "userids.txt")
    np.savetxt(id_file, np.arange(1, 51), fmt="%i")
    out_file = os.path.join(str(tmp_path), "reco.csv")
    res = reco_topk.do_topk_reco({
        "model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
        "user_history_filename": "user_history",
        "output_path": out_file, "topk": 10})
    assert res.shape == (50, 10)
    assert (res > 0).all()  # padding item never recommended
    # recommended items are not in the user's history
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils import file_io
    hist = UserHistory.from_dataframe(
        file_io.load_table(os.path.join(root, "user_history")), 201,
        "user-item_seq")
    contained = hist.contains(np.arange(1, 51), res.astype(np.int64))
    assert not contained.any()
    assert os.path.exists(out_file)


def test_cli_dispatch(trained_ckpt, tmp_path, capsys):
    root, ckpt, out = trained_ckpt
    from unirec_tpu import cli
    rc = cli.main(["test", "--model", "SASRec", "--dataloader", "SeqRecDataset",
                   "--dataset_path", root, "--model_file", ckpt,
                   "--output_path", os.path.join(str(tmp_path), "cliout"),
                   "--test_protocol", "one_vs_all",
                   "--user_history_filename", "user_history",
                   "--metrics", "['hit@5','ndcg@5']",
                   "--exp_name", "clitest2"])
    assert rc == 0
    assert "hit@5" in capsys.readouterr().out


def test_cli_as_subprocess(synth_dataset, tmp_path):
    """The console entry point works as a real process (packaging check)."""
    import subprocess
    import sys as _sys
    root, info = synth_dataset
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from unirec_tpu import cli; cli.main(["
         "'train','--model','MF','--dataloader','BaseDataset',"
         f"'--dataset_path','{root}',"
         f"'--output_path','{os.path.join(str(tmp_path), 'cliproc')}',"
         "'--loss_type','bpr','--has_user_emb','1',"
         "'--n_sample_neg_train','9','--epochs','1',"
         "'--test_protocol','one_vs_all','--valid_protocol','one_vs_all',"
         "'--user_history_filename','user_history',"
         "'--metrics','[\\'hit@5\\']','--key_metric','hit@5',"
         "'--exp_name','cliproc'])"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    assert "hit@5" in out.stdout


def test_reco_topk_fused_matches_dense(trained_ckpt, tmp_path):
    """The fused serving path (use_fused_topk=1: bias folded into an
    augmented factor column, history masked inside the kernel wrapper)
    returns exactly the dense path's recommendations end-to-end."""
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "uids_f.txt")
    np.savetxt(id_file, np.arange(1, 41), fmt="%i")
    base = {"model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
            "user_history_filename": "user_history", "topk": 10}
    dense = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "dense.csv"),
             use_fused_topk=0))
    fused = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "fusedp.csv"),
             use_fused_topk=1))
    np.testing.assert_array_equal(dense, fused)


def test_reco_topk_approx_mode(trained_ckpt, tmp_path):
    """--topk_recall_target switches the dense serving path to
    lax.approx_max_k (the recall-tolerant production mode). This proves the
    ROUTING and the contract guarantees — shapes, and that no history/pad
    items can surface (masking happens before selection). Note the CPU test
    backend lowers approx_max_k to EXACT top-k, so the recall assertion is
    only a smoke check here (trivially 1.0); the TPU-realized recall is
    measured by bench/probe_approx_recall.py."""
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "uids_a.txt")
    uids = np.arange(1, 41)
    np.savetxt(id_file, uids, fmt="%i")
    base = {"model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
            "user_history_filename": "user_history", "topk": 10}
    exact = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "exact.csv")))
    approx = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "approx.csv"),
             topk_recall_target=0.95))
    assert approx.shape == exact.shape
    assert np.all(approx > 0)  # pad item masked out
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils import file_io
    df = file_io.load_table(os.path.join(root, "user_history"))
    hist = UserHistory.from_dataframe(df, 201, "user-item_seq")
    items, lens = hist.gather(uids.astype(np.int32))
    recalls = []
    for i in range(len(uids)):
        seen = set(items[i, :lens[i]].tolist())
        assert not (set(approx[i].tolist()) & seen)  # history excluded
        recalls.append(len(set(approx[i]) & set(exact[i])) / len(exact[i]))
    assert np.mean(recalls) >= 0.9


@needs_mesh
def test_reco_topk_sharded_matches_single(trained_ckpt, tmp_path):
    """reco-topk over a row-sharded catalog (mesh_model=8) returns exactly
    the single-device recommendations — the distributed serving path."""
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "uids.txt")
    np.savetxt(id_file, np.arange(1, 41), fmt="%i")
    base = {"model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
            "user_history_filename": "user_history", "topk": 10}
    single = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "single.csv"),
             mesh_data=1, mesh_model=1))
    sharded = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "sharded.csv"),
             mesh_data=1, mesh_model=8))
    np.testing.assert_array_equal(single, sharded)


def test_reco_topk_int8_catalog(trained_ckpt, tmp_path):
    """--catalog_int8 quantizes the serving catalog to per-row int8 (half
    the HBM read vs bf16, 2x items/chip). Selection is exact w.r.t. the
    quantized scores; here we assert routing, the history/pad guarantees,
    and high ranking overlap with the full-precision path on the trained
    synth factors."""
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "uids_q.txt")
    uids = np.arange(1, 41)
    np.savetxt(id_file, uids, fmt="%i")
    base = {"model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
            "user_history_filename": "user_history", "topk": 10,
            "use_fused_topk": 1}
    exact = reco_topk.do_topk_reco(
        dict(base, output_path=os.path.join(str(tmp_path), "fp.csv")))
    quant = reco_topk.do_topk_reco(
        dict(base, catalog_int8=1,
             output_path=os.path.join(str(tmp_path), "q8.csv")))
    assert quant.shape == exact.shape
    assert np.all(quant > 0)  # pad item masked
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils import file_io
    df = file_io.load_table(os.path.join(root, "user_history"))
    hist = UserHistory.from_dataframe(df, 201, "user-item_seq")
    items, lens = hist.gather(uids.astype(np.int32))
    recalls = []
    for i in range(len(uids)):
        seen = set(items[i, :lens[i]].tolist())
        assert not (set(quant[i].tolist()) & seen)  # history excluded
        recalls.append(len(set(quant[i]) & set(exact[i])) / len(exact[i]))
    assert np.mean(recalls) >= 0.85, np.mean(recalls)


@needs_mesh
def test_reco_topk_sharded_int8(trained_ckpt, tmp_path):
    """int8 catalogs compose with the row-sharded serving path: each shard
    holds its int8 slice + scale; results match the single-device int8
    path exactly (same quantized scores, same selection)."""
    root, ckpt, _ = trained_ckpt
    id_file = os.path.join(str(tmp_path), "uids_sq.txt")
    np.savetxt(id_file, np.arange(1, 41), fmt="%i")
    base = {"model_file": ckpt, "dataset_path": root, "dataset_name": id_file,
            "user_history_filename": "user_history", "topk": 10,
            "catalog_int8": 1}
    single = reco_topk.do_topk_reco(
        dict(base, use_fused_topk=1, mesh_data=1, mesh_model=1,
             output_path=os.path.join(str(tmp_path), "sq1.csv")))
    sharded = reco_topk.do_topk_reco(
        dict(base, mesh_data=1, mesh_model=8,
             output_path=os.path.join(str(tmp_path), "sq8.csv")))
    np.testing.assert_array_equal(single, sharded)
