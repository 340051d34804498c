"""ctypes bindings for the native table parser (unirec_tpu/native/fastio.cc).

The reference's text formats (headered TSV/CSV with list-valued columns:
user_history item_seq, libFM index_list/value_list, T5/T6 sequence splits)
are loaded by pandas + a per-cell Python list parse in
``file_io.load_txt_table`` — measured ~1-3 MB/s on list-heavy tables
because every cell crosses the Python boundary. The native parser walks
the bytes twice (count, fill) into packed numpy arrays at >100 MB/s; this
module builds it on demand with g++ (cached .so), reassembles the exact
DataFrame the pandas path produces, and returns None whenever the file
uses a feature the C parser doesn't cover (bracket lists, string columns,
missing cells) so the caller can fall back.

No pybind11 in this image — plain ``extern "C"`` + ctypes.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Dict, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger("unirec_tpu")

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "native", "fastio.cc")

_lib = None
_lib_tried = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile unirec_tpu/native/fastio.cc to a cached shared library and load it."""
    cache = os.environ.get("UNIREC_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "unirec_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libunirec_fastio.so")
    if not (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so + ".tmp", _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except Exception as e:  # noqa: BLE001 - any failure -> pandas path
            logger.debug("fastio build failed (%s); using pandas loader", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.unirec_count.restype = ctypes.c_int64
    lib.unirec_count.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.unirec_fill.restype = ctypes.c_int64
    lib.unirec_fill.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p)]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if not _lib_tried:
        _lib_tried = True
        if os.environ.get("UNIREC_FASTIO", "1") not in ("0", "false"):
            _lib = _build_lib()
    return _lib


def load_txt_table_packed(path: str, list_int_cols, list_float_cols
                          ) -> Optional[Dict]:
    """Parse a headered text table natively into PACKED arrays.

    Returns ``{"n_rows": int, "columns": [...], "scalars": {col: np[N]},
    "lists": {col: (flat_values, lengths[N])}}`` — no per-row object
    arrays, so downstream padding/expansion stays fully vectorized.
    None -> caller falls back to pandas."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    nl = data.find(b"\n")
    if nl < 0:
        return None
    header = data[:nl].decode("utf-8", "replace").strip("\r")
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    cols = header.split(sep)
    body = data[nl + 1:]
    if b"[" in body[:4096]:
        return None  # bracket-style lists -> pandas/ast path

    types = np.zeros(len(cols), np.int32)
    for i, c in enumerate(cols):
        if c in list_int_cols:
            types[i] = 1
        elif c in list_float_cols:
            types[i] = 2

    n_cols = len(cols)
    rows = ctypes.c_int64(0)
    list_counts = (ctypes.c_int64 * n_cols)()
    rc = lib.unirec_count(
        body, len(body), ctypes.c_char(sep.encode()), n_cols,
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(rows), list_counts)
    if rc != 0:
        return None
    n_rows = rows.value

    scalars: Dict[int, np.ndarray] = {}
    flats: Dict[int, np.ndarray] = {}
    lens: Dict[int, np.ndarray] = {}
    p_scal = (ctypes.c_void_p * n_cols)()
    p_i64 = (ctypes.c_void_p * n_cols)()
    p_f32 = (ctypes.c_void_p * n_cols)()
    p_lens = (ctypes.c_void_p * n_cols)()
    for i in range(n_cols):
        if types[i] == 0:
            scalars[i] = np.empty(n_rows, np.float64)
            p_scal[i] = scalars[i].ctypes.data_as(ctypes.c_void_p)
        else:
            dt = np.int64 if types[i] == 1 else np.float32
            flats[i] = np.empty(list_counts[i], dt)
            lens[i] = np.empty(n_rows, np.int32)
            (p_i64 if types[i] == 1 else p_f32)[i] = \
                flats[i].ctypes.data_as(ctypes.c_void_p)
            p_lens[i] = lens[i].ctypes.data_as(ctypes.c_void_p)
    integral = (ctypes.c_int32 * n_cols)()
    rc = lib.unirec_fill(
        body, len(body), ctypes.c_char(sep.encode()), n_cols,
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.cast(p_scal, ctypes.POINTER(ctypes.c_void_p)), integral,
        ctypes.cast(p_i64, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(p_f32, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(p_lens, ctypes.POINTER(ctypes.c_void_p)))
    if rc != 0:
        return None

    packed: Dict = {"n_rows": n_rows, "columns": list(cols),
                    "scalars": {}, "lists": {}}
    for i, c in enumerate(cols):
        if types[i] == 0:
            v = scalars[i]
            # match pandas dtype inference: all-integral -> int64
            packed["scalars"][c] = v.astype(np.int64) if integral[i] else v
        else:
            packed["lists"][c] = (flats[i], lens[i])
    return packed


def load_txt_table_native(path: str, list_int_cols, list_float_cols
                          ) -> Optional[pd.DataFrame]:
    """DataFrame-compat wrapper over the packed parse (per-row ndarray
    views rebuilt with np.split — costs ~40% of the load; prefer the
    packed form in hot paths)."""
    packed = load_txt_table_packed(path, list_int_cols, list_float_cols)
    if packed is None:
        return None
    n_rows = packed["n_rows"]
    out = {}
    for c in packed["columns"]:
        if c in packed["scalars"]:
            out[c] = packed["scalars"][c]
        else:
            flat, lens = packed["lists"][c]
            splits = np.cumsum(lens[:-1]) if n_rows > 1 else []
            out[c] = pd.Series(np.split(flat, splits), dtype=object) \
                if n_rows else pd.Series([], dtype=object)
    return pd.DataFrame(out, columns=packed["columns"])


def pad_packed(flat: np.ndarray, lens: np.ndarray, dtype,
               width: Optional[int] = None) -> np.ndarray:
    """Vectorized equivalent of datasets._pad_group on a packed list column:
    out[r, :min(lens[r], width)] = first elements of row r, zero padded."""
    n = len(lens)
    width = int(width or max(int(lens.max()) if n else 1, 1))
    offsets = np.concatenate([[0], np.cumsum(lens[:-1])]) if n else \
        np.zeros(0, np.int64)
    j = np.arange(width)
    valid = j[None, :] < np.minimum(lens, width)[:, None]
    out = np.zeros((n, width), dtype=dtype)
    src = offsets[:, None] + j[None, :]
    out[valid] = flat[src[valid]]
    return out
