"""REAL multi-process (multi-host-shaped) training on a CPU Gloo cluster.

The reference's distributed test (tests/test_model/test_multi_gpu.py:23-41)
needs 2 physical GPUs and torchrun. Here two OS processes — each owning 2
virtual CPU devices — rendezvous through the framework's own
``initialize_distributed`` (core/distributed.py), build ONE global
('data','model') mesh spanning all 4 devices, and run the real Trainer
epoch loop; XLA's Gloo backend carries the gradient all-reduce between the
processes. The parameter checksum must match a single-process run over the
same 4-device mesh: cross-process DP is numerically the same program.

These spawn subprocesses and are a touch slower than the in-process mesh
tests (tests/test_distributed.py), which remain the primary coverage.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the pytest process pins a single-process CPU config (conftest.py);
    # workers must build their own from scratch
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_worker(env, timeout=420):
    out = subprocess.run([sys.executable, WORKER], env=env, timeout=timeout,
                         capture_output=True, text=True)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("MPRESULT ")]
    assert line, (out.stdout[-2000:], out.stderr[-2000:])
    return json.loads(line[-1][len("MPRESULT "):])


def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    base = _clean_env()
    base["MP_OUT"] = str(tmp_path)

    # --- 2 processes x 2 local devices -> one global 4-device mesh
    procs = []
    for pid in (0, 1):
        env = dict(base, MP_LOCAL_DEVICES="2",
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, WORKER], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        assert p.returncode == 0, (stdout[-2000:], stderr[-2000:])
        line = [l for l in stdout.splitlines() if l.startswith("MPRESULT ")]
        assert line, (stdout[-2000:], stderr[-2000:])
        results.append(json.loads(line[-1][len("MPRESULT "):]))

    assert all(r["n_dev"] == 4 for r in results), results
    # both processes hold the same replicated params after the all-reduced
    # updates
    assert results[0]["param_abs_sum"] == pytest.approx(
        results[1]["param_abs_sum"], rel=1e-6), results

    # --- reference: ONE process owning all 4 devices, same global program
    ref = _run_worker(dict(base, MP_LOCAL_DEVICES="4"))
    assert ref["n_dev"] == 4
    assert results[0]["param_abs_sum"] == pytest.approx(
        ref["param_abs_sum"], rel=2e-4), (results, ref)
    assert np.isfinite(ref["param_abs_sum"]) and ref["param_abs_sum"] > 0

    # full-catalog evaluation also ran cross-process (replicated metric
    # outputs, evaluators._jit) and matches the single-process metrics
    for k, v in ref["metrics"].items():
        assert results[0]["metrics"][k] == pytest.approx(v, abs=1e-6), (
            k, results, ref)
        assert results[1]["metrics"][k] == pytest.approx(v, abs=1e-6)

    # checkpoint roundtrip: process 0 wrote (save barrier), both reloaded
    for r in results:
        assert r["reload_abs_sum"] == pytest.approx(r["param_abs_sum"],
                                                    rel=1e-6), results
