"""Serving export: checkpoint → serialized StableHLO functions.

Capability parity with the reference's ONNX path (utils/torch2onnx.py:30-90 +
examples/serving C#/Java clients): three serving entry points — user
embedding, item embedding, and (user, item) scoring — are traced with
``jax.export``, numerically validated against the live model (the reference's
atol check, torch2onnx.py:67-88), and written as portable StableHLO artifacts
plus a JSON manifest. ``load_artifact`` rehydrates a callable from the bytes
on any backend, which is what a serving job (or the example client in
examples/serving_client.py) uses.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from unirec_tpu.utils.checkpoint import load_model_freely


def _serve_fns(model, params, constants, config):
    def variables():
        v = {"params": params}
        if constants:
            v["constants"] = constants
        return v

    L = int(config.get("max_seq_len", 10))
    is_seqrec = bool(getattr(model, "is_seqrec", False))

    # outputs pinned to f32 regardless of the model's compute_dtype (the
    # TPU default is bf16): serving clients read fixed-size f32 buffers —
    # a dtype that shifts with the training config would silently change
    # the artifact ABI (caught by the C++ client's size check)
    def user_emb(user_id, item_seq, item_seq_len):
        batch = {"user_id": user_id, "item_seq": item_seq,
                 "item_seq_len": item_seq_len}
        return model.apply(variables(), batch,
                           method="user_emb").astype(jnp.float32)

    def item_emb(item_id):
        return model.apply(variables(), item_id, None,
                           method="item_emb").astype(jnp.float32)

    def score(user_id, item_seq, item_seq_len, item_id):
        batch = {"user_id": user_id, "item_seq": item_seq,
                 "item_seq_len": item_seq_len, "item_id": item_id}
        return model.apply(variables(), batch,
                           method="predict").astype(jnp.float32)

    return user_emb, item_emb, score, L, is_seqrec


def export_model(model_file: str, out_dir: str, batch_size: int = 0,
                 n_candidates: int = 32, atol: float = 1e-5) -> Dict[str, Any]:
    """Export the three serving functions. ``batch_size`` 0 → symbolic batch
    dimension (the reference's ONNX dynamic batch axis, torch2onnx.py:52)."""
    os.makedirs(out_dir, exist_ok=True)
    model, params, constants, config = load_model_freely(model_file)
    user_emb, item_emb, score, L, is_seqrec = _serve_fns(
        model, params, constants, config)

    if batch_size > 0:
        b = batch_size
        specs = {
            "user_emb": (jax.ShapeDtypeStruct((b,), jnp.int32),
                         jax.ShapeDtypeStruct((b, L), jnp.int32),
                         jax.ShapeDtypeStruct((b,), jnp.int32)),
            "item_emb": (jax.ShapeDtypeStruct((b,), jnp.int32),),
            "score": (jax.ShapeDtypeStruct((b,), jnp.int32),
                      jax.ShapeDtypeStruct((b, L), jnp.int32),
                      jax.ShapeDtypeStruct((b,), jnp.int32),
                      jax.ShapeDtypeStruct((b, n_candidates), jnp.int32)),
        }
    else:
        (bdim,) = jexport.symbolic_shape("b")
        specs = {
            "user_emb": (jax.ShapeDtypeStruct((bdim,), jnp.int32),
                         jax.ShapeDtypeStruct((bdim, L), jnp.int32),
                         jax.ShapeDtypeStruct((bdim,), jnp.int32)),
            "item_emb": (jax.ShapeDtypeStruct((bdim,), jnp.int32),),
            "score": (jax.ShapeDtypeStruct((bdim,), jnp.int32),
                      jax.ShapeDtypeStruct((bdim, L), jnp.int32),
                      jax.ShapeDtypeStruct((bdim,), jnp.int32),
                      jax.ShapeDtypeStruct((bdim, n_candidates), jnp.int32)),
        }

    fns = {"user_emb": user_emb, "item_emb": item_emb, "score": score}
    manifest = {"model": config.get("model"), "max_seq_len": L,
                "is_seqrec": is_seqrec, "n_items": config.get("n_items"),
                "n_users": config.get("n_users"),
                "embedding_size": config.get("embedding_size"),
                "functions": {}}
    for name, fn in fns.items():
        exported = jexport.export(jax.jit(fn))(*specs[name])
        blob = exported.serialize()
        fname = f"{name}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        # raw StableHLO alongside the jax.export blob: this is what a
        # non-Python PJRT consumer compiles directly (examples/serving_cpp/
        # feeds it to PJRT_Client_Compile with format="mlir"). Written as
        # VERSIONED MLIR BYTECODE (mlir_module_serialized), not text — the
        # bytecode carries StableHLO version info for cross-release
        # compatibility; text from a newer jax can fail to parse in an
        # older runtime's compiler.
        mlir_name = f"{name}.mlir"
        with open(os.path.join(out_dir, mlir_name), "wb") as f:
            f.write(exported.mlir_module_serialized)
        # jax.export PRUNES arguments the traced function never uses (an
        # MF score ignores item_seq/item_seq_len, so its module's @main
        # takes 2 of the 4 logical args). Python consumers are insulated
        # (Exported.call re-drops them), but a raw-MLIR consumer like
        # examples/serving_cpp must feed EXACTLY the kept ones — executing
        # with the logical arity aborts the server side of a PJRT session
        # with no error surfaced. kept_inputs holds the indices into
        # in_shapes that the .mlir module actually takes, in order.
        kept = list(getattr(exported, "module_kept_var_idx",
                            range(len(specs[name]))))
        manifest["functions"][name] = {
            "file": fname,
            "mlir": mlir_name,
            "in_shapes": [[d if isinstance(d, int) else str(d) for d in s.shape]
                          for s in specs[name]],
            "kept_inputs": kept,
        }
        # numerical validation against the live model (torch2onnx.py:67-88)
        rng = np.random.default_rng(0)
        b_val = batch_size if batch_size > 0 else 4
        args = []
        for s in specs[name]:
            shape = tuple(b_val if not isinstance(d, int) else d
                          for d in s.shape)
            hi = max(int(config.get("n_items", 100)) - 1, 2)
            args.append(jnp.asarray(
                rng.integers(1, hi, size=shape), jnp.int32))
        got = jexport.deserialize(blob).call(*args)
        want = fn(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=atol, rtol=1e-4)
    # serialized XLA CompileOptions for non-Python PJRT consumers: some
    # PJRT plugins reject an empty options blob, so ship a valid default
    # (1 replica / 1 partition) alongside the modules
    try:
        from jax._src import compiler as _compiler
        copts = _compiler.get_compile_options(num_replicas=1, num_partitions=1)
        with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
            f.write(copts.SerializeAsString())
        manifest["compile_options"] = "compile_options.pb"
    except Exception:  # noqa: BLE001 — jax-internal API; export still valid
        pass
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingModel:
    """Client-side loader for an exported artifact directory."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._fns = {}
        for name, info in self.manifest["functions"].items():
            with open(os.path.join(artifact_dir, info["file"]), "rb") as f:
                self._fns[name] = jexport.deserialize(f.read())

    def __getattr__(self, name):
        if name in ("manifest", "_fns"):
            raise AttributeError(name)
        if name in self._fns:
            fn = self._fns[name]
            return lambda *args: np.asarray(
                fn.call(*[jnp.asarray(a, jnp.int32) for a in args]))
        raise AttributeError(name)
