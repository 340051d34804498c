"""Config-driven train/test/infer entry point.

TPU-native counterpart of the reference's ``unirec/main/main.py:247-509``:
one ``run(args)`` merges config layers, builds datasets/batchers, constructs
the model by registry name, dispatches to Trainer (SGD models) or Solver
(closed-form models), runs the requested task, and persists results.

The Accelerate/NCCL process-group setup (reference main.py:451-463) is
replaced by one jax.sharding.Mesh; multi-host runs call
``jax.distributed.initialize`` before ``run`` (see parallel docs).
"""
from __future__ import annotations

import copy
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from unirec_tpu import config as config_mod
from unirec_tpu.constants import DataFormat, EvalProtocol, LossType, TaskType
from unirec_tpu.core.mesh import create_mesh
from unirec_tpu.data import construct_item_popularity, make_eval_batcher, make_train_batcher
from unirec_tpu.data.history import UserHistory
from unirec_tpu.facility.solver import Solver
from unirec_tpu.facility.trainer import Trainer
from unirec_tpu.utils import file_io
from unirec_tpu.utils.logger import setup_logger
from unirec_tpu.utils.registry import get_dataset_class, get_model_class


def need_user_history(config) -> bool:
    """(reference main.py:206-216)"""
    if int(config.get("n_sample_neg_train", 0) or 0) > 0:
        return True
    if config.get("test_protocol") == EvalProtocol.ONE_VS_ALL.value:
        return True
    if config.get("valid_protocol") == EvalProtocol.ONE_VS_ALL.value:
        return True
    if int(config.get("enable_morec", 0) or 0) > 0:
        return True
    return False


def load_user_history(config) -> Optional[UserHistory]:
    path = config["dataset_path"]
    fname = config.get("user_history_filename", "train")
    fmt = config.get("user_history_file_format", config.get("train_file_format"))
    return UserHistory.load(
        os.path.join(path, fname), int(config["n_users"]), fmt,
        capacity=int(config.get("user_history_capacity", -1) or -1),
        with_time=bool(config.get("time_seq", 0)))


def _task_config(config, task: str) -> Dict[str, Any]:
    c = copy.deepcopy(config)
    c["data_loader_task"] = task
    c["data_format"] = config[f"{task}_file_format"]
    c["eval_protocol"] = config.get(f"{task}_protocol")
    if c["eval_protocol"] == EvalProtocol.ONE_VS_ALL.value:
        c[f"n_sample_neg_{task}"] = -1
    return c


def _load_features(config) -> Optional[np.ndarray]:
    if not config.get("use_features"):
        return None
    import ast
    shape = config.get("features_shape", [])
    if isinstance(shape, str):
        shape = ast.literal_eval(shape)
    return file_io.load_features(config["features_filepath"],
                                 int(config["n_items"]), len(shape))


def run(args: Dict[str, Any]) -> Optional[Dict[str, float]]:
    config = config_mod.parse_arguments(args)
    task = config.get("task", TaskType.TRAIN.value)
    # test/infer from a checkpoint: the ckpt-embedded config defines the
    # model architecture; caller args are re-applied on top
    # (reference main.py:304-306,332-334)
    if config.get("model_file") and (
            task in (TaskType.TEST.value, TaskType.INFER.value)
            or config.get("load_pretrained_model")):
        try:
            from unirec_tpu.utils.checkpoint import load_checkpoint
            ckpt_cfg = load_checkpoint(config["model_file"]).get("config")
        except (FileNotFoundError, KeyError):
            ckpt_cfg = None
        if ckpt_cfg:
            base = dict(ckpt_cfg)
            base.update({k: v for k, v in args.items()})
            base.update(config.get("cmd_args", {}))
            base["task"] = task
            config = base
    exp_name = config.get("exp_name") or f"{config['model']}-{config.get('dataset','data')}"
    config["exp_name"] = exp_name
    out_path = config.get("output_path") or os.path.join(".", "output", exp_name)
    config["output_path"] = out_path
    os.makedirs(out_path, exist_ok=True)

    # multi-host rendezvous MUST run before anything touches the JAX backend
    # (jax.distributed.initialize precondition) — so before process_index()
    # in setup_logger below. Replaces torchrun (reference main.py:451-463).
    from unirec_tpu.core.distributed import initialize_distributed
    multi_host = initialize_distributed(config)

    import jax
    logger = setup_logger(exp_name, out_path, config.get("state", "INFO"),
                          is_main_process=jax.process_index() == 0)
    logger.info("task=%s model=%s dataset=%s", task, config["model"],
                config.get("dataset"))
    if multi_host:
        logger.info("multi-host: process %d/%d, %d devices total",
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))

    np.random.seed(int(config.get("seed", 2022)))

    # kernel-level trace (TPU equivalent of the reference's whole-run
    # cProfile, main.py:490-499): view with tensorboard or xprof
    if int(config.get("profile", 0) or 0):
        import jax
        trace_dir = os.path.join(out_path, "profile")
        jax.profiler.start_trace(trace_dir)
        logger.info("jax profiler tracing to %s", trace_dir)

    mesh = create_mesh(config)
    logger.info("mesh: data=%d model=%d", mesh.n_data, mesh.n_model)

    ds_cls = get_dataset_class(config.get("dataloader", "BaseDataset"))
    dpath = config["dataset_path"]
    train_name = config.get("data_train_name", "train")
    valid_name = config.get("data_valid_name", "valid")
    test_name = config.get("data_test_name", "test")

    # sequential dataloaders always need the packed history for the per-row
    # item_seq window (reference main.py:271-276)
    needs_history = need_user_history(config) or \
        config.get("dataloader") in ("SeqRecDataset", "AERecDataset")
    history = load_user_history(config) if needs_history else None
    item_pop = None
    if float(config.get("neg_by_pop_alpha", 0) or 0) > 0 \
            or "pop-kl" in str(config.get("metrics", "")) \
            or int(config.get("enable_morec", 0) or 0) > 0:
        if history is not None:
            item_pop = construct_item_popularity(history, int(config["n_items"]))

    # MoRec item meta is needed by both the sampler and the evaluators
    # (reference main.py:282-291)
    if int(config.get("enable_morec", 0) or 0) > 0 or any(
            t in str(config.get("metrics", ""))
            for t in ("pop-kl", "least-misery", "rhit", "rndcg", "rrecall")):
        from unirec_tpu.facility.morec import (load_alignment_distribution,
                                               load_morec_meta_data)
        meta_file = os.path.join(config["dataset_path"],
                                 config.get("item_meta_morec_filename",
                                            "item_meta_morec.csv"))
        if os.path.exists(meta_file):
            objectives = list(config.get("morec_objectives",
                                         ["fairness", "alignment", "revenue"]))
            item_meta = load_morec_meta_data(int(config["n_items"]), meta_file,
                                             objectives)
            align_file = config.get("align_dist_filename")
            config["_item_meta_morec"] = item_meta
            config["_alignment_dist"] = load_alignment_distribution(
                item_meta, item_pop,
                os.path.join(config["dataset_path"], align_file)
                if align_file else None)
    features = _load_features(config)

    # ----------------------------------------------------------------- model
    model_cls = get_model_class(config["model"])
    if features is not None:
        config["_item2features"] = features
    if config.get("use_text_emb") and config.get("text_emb_path"):
        config["_text_emb"] = _padded_emb(file_io.load_pre_item_emb(config["text_emb_path"]))
    if config.get("use_pre_item_emb") and config.get("item_emb_path"):
        config["_pre_item_emb"] = _padded_emb(file_io.load_pre_item_emb(config["item_emb_path"]))
    model = model_cls(cfg=config) if _is_flax(model_cls) else model_cls(config)
    sgd = getattr(model, "optimized_by_sgd", True)

    driver = (Trainer if sgd else Solver)(config, model, mesh)
    if history is not None:
        driver.set_user_history(history)

    # ------------------------------------------------------------- batchers
    def build_eval(task_name, file_name):
        tcfg = _task_config(config, task_name)
        ds = ds_cls(tcfg, dpath, file_name)
        tcfg["eval_protocol"] = tcfg.get("eval_protocol")
        return make_eval_batcher(ds, tcfg, history, task=task_name,
                                 item_popularity=item_pop, features=features), tcfg

    result = None
    if task == TaskType.TRAIN.value:
        tcfg = _task_config(config, "train")
        train_ds = ds_cls(tcfg, dpath, train_name)
        valid_batcher, vcfg = (None, None)
        if os.path.exists(os.path.join(dpath, valid_name + ".pkl")) or \
                _exists_any(dpath, valid_name):
            valid_batcher, vcfg = build_eval("valid", valid_name)
            driver.reset_evaluator(vcfg["data_format"], vcfg["eval_protocol"])
        if sgd:
            if int(config.get("enable_morec", 0) or 0) > 0:
                from unirec_tpu.facility.morec import build_morec
                from unirec_tpu.data.pipeline import make_negative_sampler
                # signal batcher: the valid split read with the *train* task
                # config (reference main.py:168-177)
                sig_ds = ds_cls(tcfg, dpath, valid_name)
                signal_batcher = make_train_batcher(sig_ds, tcfg, history,
                                                    item_popularity=item_pop,
                                                    features=features)
                train_batcher = build_morec(
                    driver, tcfg, train_ds, signal_batcher, history, item_pop,
                    features,
                    item_sampler=make_negative_sampler(tcfg, history, item_pop))
            elif _device_pipeline_ok(config, train_ds, history, features):
                # TPU-native data path: host feeds raw id columns; sampling,
                # history/time windows and feature gathers fuse into the
                # jitted train step
                from unirec_tpu.data.device_pipeline import (DeviceAugmenter,
                                                             RawIdBatcher)
                aerec = train_ds.fmt == "aerec-train"
                aug_history = history
                if aerec:
                    # AE training reconstructs the *train-split* deduped
                    # history (datasets.py AERecDataset._normalize), not the
                    # global user_history table — scatter the dataset's
                    # packed rows into a user-indexed matrix
                    from unirec_tpu.data.history import UserHistory
                    cols = train_ds.cols
                    n_users = int(tcfg["n_users"])
                    mat = np.zeros((n_users, cols["hist"].shape[1]), np.int32)
                    lens = np.zeros(n_users, np.int32)
                    uid = cols["user_id"].astype(np.int64)
                    mat[uid] = cols["hist"]
                    lens[uid] = cols["hist_len"]
                    aug_history = UserHistory(mat, lens)
                driver.set_device_augmenter(
                    DeviceAugmenter(tcfg, aug_history, item_pop,
                                    features=features, aerec=aerec))
                cols = train_ds.cols
                extra = {k: cols[k] for k in ("label", "max_len")
                         if k in cols}
                train_batcher = RawIdBatcher(
                    cols["user_id"],
                    np.zeros_like(cols["user_id"]) if aerec else cols["item_id"],
                    int(tcfg.get("batch_size", 256)),
                    seed=int(tcfg.get("seed", 2022)),
                    shuffle=bool(tcfg.get("shuffle_train", 0)),
                    extra=extra)
                logger.info("device-side batch augmentation enabled")
            else:
                train_batcher = make_train_batcher(train_ds, tcfg, history,
                                                   item_popularity=item_pop,
                                                   features=features)
            try:
                driver.fit(train_batcher, valid_batcher,
                           load_pretrained_model=bool(config.get("load_pretrained_model")),
                           model_file=config.get("model_file"),
                           verbose=int(config.get("verbose", 1)))
            except KeyboardInterrupt:
                # reference main.py:376-377: Ctrl-C during fit still falls
                # through to test evaluation and persists the results
                logger.info("Keyboard interrupt: stopping the training and "
                            "start evaluating on the test set.")
        else:
            graph = train_ds.get_graph()
            try:
                driver.fit(graph, valid_batcher)
            except KeyboardInterrupt:
                logger.info("Keyboard interrupt: stopping the training and "
                            "start evaluating on the test set.")

        if _exists_any(dpath, test_name):
            test_batcher, scfg = build_eval("test", test_name)
            driver.reset_evaluator(scfg["data_format"], scfg["eval_protocol"])
            result = driver.evaluate(test_batcher,
                                     load_best_model=sgd and valid_batcher is not None)
            logger.info("test result: %s", result)
    elif task == TaskType.TEST.value:
        if sgd and config.get("model_file"):
            driver.load_model(config["model_file"])
        elif not sgd and config.get("model_file"):
            driver.load_model(config["model_file"])
        test_batcher, scfg = build_eval("test", test_name)
        driver.reset_evaluator(scfg["data_format"], scfg["eval_protocol"])
        result = driver.evaluate(test_batcher, load_best_model=False)
        logger.info("test result: %s", result)
    elif task == TaskType.INFER.value:
        if config.get("model_file"):
            driver.load_model(config["model_file"])
        test_batcher, scfg = build_eval("test", test_name)
        driver.reset_evaluator(scfg["data_format"],
                               scfg["eval_protocol"] or EvalProtocol.ONE_VS_K.value)
        scores = driver.evaluate(test_batcher, load_best_model=False, predict_only=True)
        out_file = os.path.join(out_path, f"{exp_name}.infer.txt")
        import jax
        if jax.process_index() == 0:  # one writer on shared filesystems
            np.savetxt(out_file, np.asarray(scores).reshape(len(scores), -1),
                       fmt="%.6f")
            logger.info("wrote inference scores to %s", out_file)
        if int(config.get("profile", 0) or 0):
            import jax
            jax.profiler.stop_trace()
        return None
    else:
        raise ValueError(f"unknown task: {task}")

    if int(config.get("profile", 0) or 0):
        import jax
        jax.profiler.stop_trace()

    import jax
    if result is not None and jax.process_index() == 0:
        res_file = os.path.join(out_path, f"{exp_name}.result.tsv")
        with open(res_file, "w") as f:
            f.write("\t".join(result.keys()) + "\n")
            f.write("\t".join(f"{v:.6f}" for v in result.values()) + "\n")
    return result


def _device_pipeline_ok(config, train_ds, history, features) -> bool:
    """Device-side augmentation covers scalar rows, grouped T4 rows (2-D
    item_id + label), categorical features, T6 time sequences, T1_1
    max_len, and AERec training. Only T7 libFM rows (ragged per-interaction
    feature lists with no device table to gather from) stay host-side."""
    if not int(config.get("device_pipeline", 0) or 0):
        return False
    if "index_list" in train_ds.cols:  # T7 libFM
        return False
    if train_ds.fmt == "aerec-train":
        return history is not None
    if train_ds.cols.get("item_id") is None:
        return False
    if train_ds.is_sequential and history is None:
        return False
    return True


def _is_flax(cls) -> bool:
    from flax import linen as nn
    return issubclass(cls, nn.Module)


def _exists_any(path, prefix) -> bool:
    return any(os.path.exists(os.path.join(path, prefix + ext))
               for ext in (".ftr", ".pkl", ".tsv", ".csv", ".txt"))


def _padded_emb(emb: np.ndarray) -> np.ndarray:
    """Prepend the zero row for padding item 0 (reco_abc.py:193-195)."""
    return np.concatenate([np.zeros((1, emb.shape[1]), emb.dtype), emb], axis=0)
