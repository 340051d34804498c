"""End-to-end test of the C++ PJRT serving client (examples/serving_cpp).

Builds unirec_serve.cc with g++, exports a trained model to StableHLO MLIR,
runs the native binary against a real PJRT plugin, and checks the scores
match the in-process Python model exactly.

Needs a PJRT plugin .so and a device behind it — in this environment that's
the axon TPU tunnel, so the test is opt-in (UNIREC_SERVING_CPP_TEST=1) to
keep the CPU suite hermetic; the round driver / verify flow runs it on TPU.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "examples", "serving_cpp")
PLUGIN = os.environ.get("UNIREC_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
TF_INCLUDE = os.path.join(os.path.dirname(os.path.abspath(os.__file__)),
                          "..", "site-packages", "tensorflow", "include")

pytestmark = pytest.mark.skipif(
    not int(os.environ.get("UNIREC_SERVING_CPP_TEST", "0") or 0)
    or not os.path.exists(PLUGIN) or shutil.which("g++") is None,
    reason="opt-in TPU test: needs UNIREC_SERVING_CPP_TEST=1 + PJRT plugin + g++")


def test_cpp_client_matches_python(tmp_path):
    import tensorflow  # locate the PJRT C API header

    tf_include = os.path.join(os.path.dirname(tensorflow.__file__), "include")
    binary = str(tmp_path / "unirec_serve")
    subprocess.run(
        ["g++", "-O2", "-std=c++17",
         os.path.join(CPP_DIR, "unirec_serve.cc"), "-ldl",
         "-I", tf_include, "-o", binary],
        check=True)

    # train a small model on synth data (host CPU), export fixed-batch
    import copy

    from tests.synth import BASE_CONF, generate
    from unirec_tpu.main import main
    from unirec_tpu.serving.export import export_model

    root = str(tmp_path / "data")
    generate(root)
    conf = copy.deepcopy(BASE_CONF)
    conf.update(model="MF", dataloader="BaseDataset", has_user_emb=True,
                epochs=1, dataset_path=root, task="train",
                output_path=str(tmp_path / "out"), exp_name="cpp")
    main.run(conf)
    ckpt = str(tmp_path / "out" / "checkpoint" / "cpp.pkl")
    art = str(tmp_path / "art")
    B, C = 4, 8
    export_model(ckpt, art, batch_size=B, n_candidates=C)

    sys.path.insert(0, CPP_DIR)
    import tensor_io

    rng = np.random.default_rng(0)
    user_id = rng.integers(1, 200, size=B).astype(np.int32)
    item_seq = rng.integers(0, 300, size=(B, BASE_CONF["max_seq_len"])).astype(np.int32)
    seq_len = rng.integers(1, 10, size=B).astype(np.int32)
    item_id = rng.integers(1, 300, size=(B, C)).astype(np.int32)
    inputs = [user_id, item_seq, seq_len, item_id]
    # the raw .mlir module takes only the KEPT args (jax.export prunes
    # unused ones — MF's score ignores the sequence inputs); feeding the
    # full logical signature aborts the execution server-side
    import json
    manifest = json.load(open(os.path.join(art, "manifest.json")))
    kept = manifest["functions"]["score"]["kept_inputs"]
    tensor_io.write_tensors(str(tmp_path / "in.bin"), [inputs[i] for i in kept])

    env = dict(os.environ)
    if "axon" in PLUGIN and "UNIREC_PJRT_OPTIONS" not in env:
        # the axon dev plugin needs the same create-options the python
        # registration passes (axon/register/pjrt.py)
        import uuid
        gen = env.get("PALLAS_AXON_TPU_GEN", "v5e")
        rc = 1 if env.get("PALLAS_AXON_REMOTE_COMPILE") == "1" else 0
        # claim_timeout_s: the pool allocator holds a dead session's tile
        # claim for up to ~3 minutes; with a timeout the bind retries
        # server-side instead of failing after the plugin's 8 quick tries
        # (measured: a run right after another TPU job needs this)
        env["UNIREC_PJRT_OPTIONS"] = (
            f"remote_compile={rc};local_only=0;priority=0;"
            f"topology={gen}:1x1x1;n_slices=1;"
            f"session_id={uuid.uuid4()};rank=4294967295;claim_timeout_s=180")
        # ...and the process env that sitecustomize.py exports at runtime
        # BEFORE the python PJRT init: without AXON_POOL_SVC_OVERRIDE the
        # stateful session leg resolves the pool's headless-service DNS
        # (zero egress here → "connection dropped"); compile is a
        # separate stateless leg, which is why it worked without this.
        env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
        env.setdefault("PJRT_LIBRARY_PATH", PLUGIN)
        try:
            from axon.register import COMPAT_VERSION
            env.setdefault("AXON_COMPAT_VERSION", str(COMPAT_VERSION))
        except ImportError:
            pass
    subprocess.run(
        [binary, PLUGIN, os.path.join(art, "score.mlir"),
         str(tmp_path / "in.bin"), str(tmp_path / "out.bin")],
        check=True, env=env)
    (got,) = tensor_io.read_tensors(str(tmp_path / "out.bin"))

    from unirec_tpu.serving.export import ServingModel
    sm = ServingModel(art)
    want = np.asarray(sm.score(user_id, item_seq, seq_len, item_id))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
