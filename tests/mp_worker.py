"""Subprocess worker for tests/test_multiprocess.py.

Runs the REAL multi-host path end-to-end on a CPU Gloo cluster: the
framework's ``core.distributed.initialize_distributed`` (the torchrun-c10d
counterpart of reference examples/training/multi_gpu_train_ml100k.sh:50)
brings up the process group from env vars, ``core.mesh.create_mesh`` spans
the GLOBAL device set, and ``facility.trainer.Trainer`` trains SASRec for
two epochs with the device pipeline. Every process feeds the same global
batches; ``MeshContext.shard_batch`` splits them over the 'data' axis, so
each process's devices compute only their shard and GSPMD inserts the
gradient all-reduce over Gloo.

Prints one ``MPRESULT {json}`` line with a parameter checksum — the test
asserts it matches a single-process run of the same global mesh size.
"""
import json
import os
import sys


def main():
    n_local = int(os.environ.get("MP_LOCAL_DEVICES", "2"))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_local}")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from unirec_tpu.core.distributed import initialize_distributed
    initialize_distributed({})  # reads JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID

    import numpy as np
    from unirec_tpu import config as config_mod
    from unirec_tpu.core.mesh import create_mesh
    from unirec_tpu.data.device_pipeline import DeviceAugmenter, RawIdBatcher
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.facility.trainer import Trainer
    from unirec_tpu.utils.registry import get_model_class

    N_USERS, N_ITEMS, CAP, B, STEPS = 60, 90, 20, 64, 6
    rng = np.random.default_rng(0)
    lens = rng.integers(3, CAP, size=N_USERS).astype(np.int32)
    items = np.zeros((N_USERS, CAP), np.int32)
    mask = np.arange(CAP)[None, :] < lens[:, None]
    items[mask] = rng.integers(1, N_ITEMS, size=int(mask.sum()))
    history = UserHistory(items, lens)

    cfg = config_mod.parse_arguments({
        "model": "SASRec", "n_users": N_USERS, "n_items": N_ITEMS,
        "max_seq_len": 8, "embedding_size": 16, "hidden_size": 16,
        "inner_size": 32, "n_layers": 1, "n_heads": 2, "loss_type": "bce",
        "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1,
        "learning_rate": 1e-2, "group_size": -1, "n_sample_neg_train": 3,
        "dataloader": "SeqRecDataset", "history_mask_mode": "autoregressive",
        "epochs": 2, "batch_size": B, "seed": 7,
        "exp_name": f"mp{jax.process_index()}",
        "output_path": os.environ.get("MP_OUT", "/tmp/mp_worker"),
    }, argv=[])
    model = get_model_class("SASRec")(cfg=cfg)
    mesh = create_mesh(cfg)
    trainer = Trainer(cfg, model, mesh)
    trainer.set_device_augmenter(DeviceAugmenter(cfg, history))

    raw = RawIdBatcher(rng.integers(1, N_USERS, size=B * STEPS),
                       rng.integers(1, N_ITEMS, size=B * STEPS),
                       B, shuffle=False)
    trainer.fit(raw, valid_data=None, save_model=False)

    params = jax.device_get(trainer.params)
    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree_util.tree_leaves(params)))

    # full-catalog (one_vs_all) evaluation over the same global mesh: the
    # per-batch metric programs run replicated outputs cross-process
    # (evaluators._jit), so the dispatch-only sweep's bulk fetch works on
    # every process
    from unirec_tpu.facility.evaluation.evaluators import OnePositiveEvaluator
    ev = OnePositiveEvaluator(
        dict(cfg, metrics="['hit@5','ndcg@5','mrr@5']"), model, mesh)
    uids = np.arange(1, 33, dtype=np.int64)
    seq, seq_len = history.window(uids, int(cfg["max_seq_len"]))
    pos = items[uids, np.maximum(lens[uids] - 1, 0)].astype(np.int64)
    eval_batch = {"user_id": uids, "item_seq": seq, "item_seq_len": seq_len,
                  "item_id": pos, "weight": np.ones(len(uids), np.float32)}
    metrics = ev.evaluate_full([eval_batch], trainer.params, history,
                               trainer.constants)

    # checkpoint roundtrip on the shared filesystem: process 0 writes (the
    # save barrier keeps the others from racing ahead), every process loads
    ckpt_file = os.path.join(os.environ.get("MP_OUT", "/tmp/mp_worker"),
                             "mp_ckpt.pkl")
    trainer.save_model(ckpt_file, cur_epoch=2, quiet=True)
    from unirec_tpu.utils.checkpoint import load_checkpoint
    reloaded = load_checkpoint(ckpt_file)["params"]
    reload_sum = float(sum(np.abs(np.asarray(x)).sum()
                           for x in jax.tree_util.tree_leaves(reloaded)))

    print("MPRESULT " + json.dumps({
        "proc": jax.process_index(), "n_dev": jax.device_count(),
        "param_abs_sum": checksum, "reload_abs_sum": reload_sum,
        "metrics": {k: round(v, 8) for k, v in metrics.items()}}), flush=True)


if __name__ == "__main__":
    main()
