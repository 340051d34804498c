"""Unified command-line entry point.

    python -m unirec_tpu.cli train --model SASRec --dataset_path ... [flags]
    python -m unirec_tpu.cli test  --model_file ckpt.pkl ...
    python -m unirec_tpu.cli infer --model_file ckpt.pkl ...
    python -m unirec_tpu.cli infer-embedding --model_file ... --node_type user
    python -m unirec_tpu.cli reco-topk --model_file ... --topk 100

Replaces the reference's three separate ``python -m unirec.main.*`` scripts
(main.py:425, infer_embedding.py:132, reco_topk.py:172) with one dispatcher;
every ``--key value`` flag flows through the layered config merge
(config/__init__.py), so the full ~120-flag surface of the reference's
argument_parser is available without a hand-maintained flag list.
"""
from __future__ import annotations

import sys

from unirec_tpu import config as config_mod

COMMANDS = ("train", "test", "infer", "infer-embedding", "reco-topk",
            "prepare-data", "download-data", "convert-splits",
            "convert-adjacency", "prepare-adaranker", "export", "sweep")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command '{cmd}'. Available: {COMMANDS}")

    if cmd in ("train", "test", "infer"):
        from unirec_tpu.main import main as main_mod
        args = config_mod.parse_cmd_arguments(rest)
        args["task"] = cmd
        result = main_mod.run(args)
        if result is not None:
            print(result)
        return 0
    if cmd == "infer-embedding":
        from unirec_tpu.main import infer_embedding
        infer_embedding.run(config_mod.parse_cmd_arguments(rest))
        return 0
    if cmd == "prepare-data":
        from unirec_tpu.data.prepare import prepare_data
        kw = config_mod.parse_cmd_arguments(rest)
        info = prepare_data(kw.pop("raw_file"), kw.pop("out_dir"), **kw)
        print(info)
        return 0
    if cmd == "download-data":
        # role of the reference's examples/preprocess/download_split_*.py
        from unirec_tpu.data import downloaders as DL
        kw = config_mod.parse_cmd_arguments(rest)
        name = kw.pop("dataset", "ml-100k")
        out = kw.pop("out_dir")
        if name == "ml-100k":
            info = DL.prepare_ml100k(out, **kw)
        elif name == "ml-10m":
            info = DL.prepare_ml10m(out, **kw)
        elif name.startswith("amazon-"):
            info = DL.prepare_amazon(name.split("-", 1)[1], out, **kw)
        else:
            raise SystemExit(f"unknown dataset '{name}' "
                             "(ml-100k, ml-10m, amazon-<category>)")
        print(info)
        return 0
    if cmd == "prepare-adaranker":
        # role of the reference's specific_datasets/ranker.py run_adaranker
        # + word2vec pretrain
        from unirec_tpu.data.ranker_prep import (build_adaranker_dataset,
                                                 pretrain_item2vec)
        kw = config_mod.parse_cmd_arguments(rest)
        out = kw.pop("out_dir")
        info = build_adaranker_dataset(kw.pop("infile"),
                                       kw.pop("item2cate_file"), out,
                                       n_neg_k=int(kw.pop("n_neg_k", 5)))
        if int(kw.pop("pretrain_item_emb", 0)):
            import pandas as pd
            dim = int(kw.pop("embedding_size", 64))
            hist = pd.read_pickle(f"{out}/user_history.pkl")
            pretrain_item2vec(list(hist["item_seq"]), info["n_items"],
                              dim=dim, out_path=f"{out}/item_emb_{dim}.txt")
        print(info)
        return 0
    if cmd == "convert-splits":
        from unirec_tpu.data.prepare import convert_splits
        kw = config_mod.parse_cmd_arguments(rest)
        print(convert_splits(kw.pop("split_dir"), kw.pop("out_dir"), **kw))
        return 0
    if cmd == "convert-adjacency":
        # CF benchmark splits (yelp2018/gowalla/amazon-book "user item..."
        # lines) — role of the reference's run_prepare_data-CF_8_1_1.sh
        from unirec_tpu.data.prepare import convert_adjacency
        kw = config_mod.parse_cmd_arguments(rest)
        print(convert_adjacency(kw.pop("split_dir"), kw.pop("out_dir"), **kw))
        return 0
    if cmd == "sweep":
        from unirec_tpu.facility.sweep import run_sweep
        kw = config_mod.parse_cmd_arguments(rest)
        best, _ = run_sweep(kw.pop("sweep_file"), kw,
                            n_trials=int(kw.pop("n_trials", 20)))
        print("best trial:", best)
        return 0
    if cmd == "export":
        from unirec_tpu.serving.export import export_model
        kw = config_mod.parse_cmd_arguments(rest)
        manifest = export_model(kw.pop("model_file"), kw.pop("out_dir"), **kw)
        print(manifest)
        return 0
    from unirec_tpu.main import reco_topk
    reco_topk.do_topk_reco(config_mod.parse_cmd_arguments(rest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
