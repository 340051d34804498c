"""Shared environment shims for running the REFERENCE (torch) pipeline
read-only from /root/reference under modern dependencies.

Used by test_reference_e2e.py (synthetic-cluster parity) and
test_golden_rehearsal.py (ml-100k-scale dress rehearsal). The shims are
idempotent: numba pass-through, setproctitle/wandb/cvxpy/feather stubs,
torch>=2.6 compat (ReduceLROnPlateau's removed ``verbose`` kwarg,
torch.load weights_only default), sklearn>=1.6 roc_auc_score returning a
plain float, scipy>=1.14 removing sparse ``.A``.
"""
from __future__ import annotations

import functools
import importlib.machinery
import sys
import types

import numpy as np
import pandas as pd

REFERENCE = "/root/reference"


def _stub(name, attrs=None):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def setup_reference_shims() -> None:
    """Install all import-time and behavioral shims the reference needs;
    safe to call repeatedly."""
    if "numba" not in sys.modules or not hasattr(sys.modules["numba"], "jit"):
        numba = _stub("numba")

        def jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        numba.jit = jit
        numba.prange = range
    _stub("setproctitle", {"setproctitle": lambda *a, **k: None})
    if "wandb" not in sys.modules:
        _stub("wandb")

    class _P:
        def __init__(self, *a, **k):
            pass

    if "cvxpy" not in sys.modules:
        _stub("cvxpy", {"Parameter": _P, "Variable": _P, "Maximize": _P,
                        "Problem": _P, "sum": lambda *a, **k: None,
                        "neg": lambda *a, **k: None,
                        "max": lambda *a, **k: None, "GLPK": None})
    _stub("feather", {"read_dataframe": pd.read_feather})
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
        np.NINF = -np.inf
    import torch
    if "verbose" not in str(
            torch.optim.lr_scheduler.ReduceLROnPlateau.__init__.__doc__ or ""):
        base = torch.optim.lr_scheduler.ReduceLROnPlateau
        if not getattr(base, "_verbose_shim", False):
            class _RLP(base):
                _verbose_shim = True

                def __init__(self, *a, verbose=False, **k):
                    super().__init__(*a, **k)

            torch.optim.lr_scheduler.ReduceLROnPlateau = _RLP
    if not isinstance(torch.load, functools.partial):
        torch.load = functools.partial(torch.load, weights_only=False)
    # sklearn>=1.6 returns a plain Python float from roc_auc_score; the
    # reference treats it as a numpy scalar (e.g. evaluator merge paths).
    import sklearn.metrics as _skm
    if not getattr(_skm.roc_auc_score, "_np_wrapped", False):
        _orig_auc = _skm.roc_auc_score
        _wrapped = functools.wraps(_orig_auc)(
            lambda *a, **k: np.float64(_orig_auc(*a, **k)))
        _wrapped._np_wrapped = True
        _skm.roc_auc_score = _wrapped
    # pandas>=2 rejects drop(columns=..., axis=1) (both given) — used by
    # the reference's ml-100k splitter (download_split_ml100k.py:279).
    # With `columns` given the axis is redundant; ignore it.
    if not getattr(pd.DataFrame.drop, "_axis_shim", False):
        _orig_drop = pd.DataFrame.drop

        @functools.wraps(_orig_drop)
        def _drop(self, labels=None, *, axis=0, index=None, columns=None,
                  **kw):
            if columns is not None and labels is None:
                axis = 0
            return _orig_drop(self, labels, axis=axis, index=index,
                              columns=columns, **kw)

        _drop._axis_shim = True
        pd.DataFrame.drop = _drop
    # scipy>=1.14 removed sparse.spmatrix.A (used by the reference's
    # AdmmSLIM, admmslim.py:34-35); restore it as a toarray alias.
    import scipy.sparse
    if not hasattr(scipy.sparse.csr_matrix, "A"):
        scipy.sparse.spmatrix.A = property(lambda self: self.toarray())
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
