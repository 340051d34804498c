"""Blocked solver linear algebra (ops/linalg.py): correctness vs numpy and
execution on a sharded ('model'-axis) matrix — the scale path for EASE-style
catalogs beyond the one-shot-LU limit (SURVEY.md §7 hard-part 6)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unirec_tpu.ops.linalg import (blocked_cholesky, blocked_tri_inv_lower,
                                   spd_inverse, spd_inverse_columns)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(n + 32, n)).astype(np.float64)
    return (R.T @ R + 10 * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n,nb", [(64, 32), (100, 32), (257, 64)])
def test_blocked_cholesky_matches_numpy(n, nb):
    A = _spd(n)
    L = np.asarray(blocked_cholesky(jnp.asarray(A), nb))
    Lref = np.linalg.cholesky(A.astype(np.float64))
    np.testing.assert_allclose(L, Lref, atol=5e-5)


def test_blocked_tri_inv_matches_numpy():
    A = _spd(100)
    L = np.linalg.cholesky(A.astype(np.float64)).astype(np.float32)
    X = np.asarray(blocked_tri_inv_lower(jnp.asarray(L), 32))
    np.testing.assert_allclose(X @ L, np.eye(100), atol=2e-4)


def test_blocked_tri_inv_upper_is_transpose_of_lower():
    from unirec_tpu.ops.linalg import blocked_tri_inv_upper

    A = _spd(130, seed=3)
    L = np.linalg.cholesky(A.astype(np.float64)).astype(np.float32)
    XU = np.asarray(blocked_tri_inv_upper(jnp.asarray(L.T), 32))
    np.testing.assert_allclose(XU @ L.T, np.eye(130), atol=2e-4)
    # (Lᵀ)⁻¹ == (L⁻¹)ᵀ — the identity spd_inverse_columns relies on
    X = np.asarray(blocked_tri_inv_lower(jnp.asarray(L), 32))
    np.testing.assert_allclose(XU, X.T, atol=1e-5)
    # assume_triangular skips the triu cleanup; with junk in the lower
    # triangle results must still match when the flag is off
    junk = L.T + np.tril(np.ones_like(L), -1)
    XU2 = np.asarray(blocked_tri_inv_upper(jnp.asarray(junk), 32))
    np.testing.assert_allclose(XU2, XU, atol=1e-6)


@pytest.mark.parametrize("n,nb", [(100, 32), (200, 64)])
def test_spd_inverse_matches_numpy(n, nb):
    A = _spd(n, seed=1)
    P_ = np.asarray(spd_inverse(jnp.asarray(A), nb))
    Pref = np.linalg.inv(A.astype(np.float64))
    scale = np.abs(Pref).max()
    np.testing.assert_allclose(P_ / scale, Pref / scale, atol=2e-5)


def test_spd_inverse_columns_stream():
    A = _spd(130, seed=2)
    Pref = np.linalg.inv(A.astype(np.float64))
    out = np.zeros((130, 130), np.float32)
    for c, slab in spd_inverse_columns(jnp.asarray(A), 32, out_block=48):
        out[:, c:c + slab.shape[1]] = slab
    scale = np.abs(Pref).max()
    np.testing.assert_allclose(out / scale, Pref / scale, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 4,
                    reason="needs a 4-device mesh (1-chip TPU run)")
def test_spd_inverse_sharded_matches_single_device():
    """Row-sharded A over a ('model',) mesh: same program, GSPMD collectives,
    identical result."""
    from unirec_tpu.core.mesh import create_mesh
    mesh = create_mesh(data=1, model=4)
    A = _spd(128, seed=3)
    jA = jax.device_put(jnp.asarray(A),
                        NamedSharding(mesh.mesh, P("model", None)))
    with mesh.mesh:
        P_sharded = np.asarray(jax.jit(spd_inverse, static_argnums=1)(jA, 32))
    P_single = np.asarray(spd_inverse(jnp.asarray(A), 32))
    np.testing.assert_allclose(P_sharded, P_single, atol=1e-5)


def test_regularized_inverse_blocked_tier():
    """models/solvers.py picks the blocked path above the one-shot limit."""
    from unirec_tpu.models.solvers import _regularized_inverse
    A = _spd(150, seed=4)
    out = _regularized_inverse(A, {"solver_device_inverse_max": 64,
                                   "solver_inverse_block": 48})
    Pref = np.linalg.inv(A.astype(np.float64))
    scale = np.abs(Pref).max()
    np.testing.assert_allclose(out / scale, Pref / scale, atol=2e-5)


def test_slim_active_set_matches_full_cd():
    """Active-set CD (O(N·K²)/sweep) equals the full cyclic CD exactly when
    K covers every coordinate, and approximates it closely at modest K
    (models/solvers.py SLIM._solve_active_set)."""
    import scipy.sparse as ssp

    from unirec_tpu.models.solvers import SLIM

    rng = np.random.default_rng(0)
    U, n = 300, 120
    graph = ssp.csr_matrix((rng.random((U, n)) < 0.07).astype(np.float32))
    cfg = {"n_users": U, "n_items": n, "l1_coef": 0.004, "l2_coef": 0.098,
           "epochs": 30}
    full = SLIM(dict(cfg))
    full.solve(graph)
    exact_k = SLIM(dict(cfg, slim_active_set_k=n - 1))
    exact_k.solve(graph)
    np.testing.assert_array_equal(exact_k.item_similarity,
                                  full.item_similarity)
    small_k = SLIM(dict(cfg, slim_active_set_k=40))
    small_k.solve(graph)
    rel = (np.linalg.norm(small_k.item_similarity - full.item_similarity)
           / np.linalg.norm(full.item_similarity))
    assert rel < 0.15, rel


def test_slim_matches_sklearn_elasticnet():
    """Direct weight-matrix parity against the reference ALGORITHM: the
    reference SLIM runs one positive ElasticNet per column with the column
    zeroed out of X (slim.py:22-66); our vectorized cyclic CD on the Gram
    optimizes the same convex objective. At convergence the two [N, N]
    weight matrices must agree — same support (a handful of borderline
    coefficients may flip), <2e-3 max-abs difference, same objective value.

    ``random_state`` is pinned: the reference-verbatim
    ``selection='random'`` otherwise consumes the GLOBAL numpy RNG, making
    which of the ~22,500 borderline coefficients sklearn leaves at exactly
    zero depend on suite ordering (the round-4 order-dependent flake). The
    comparison is about the converged weights, not sklearn's CD visit
    order, so pinning it loses nothing."""
    import warnings

    import scipy.sparse as ssp
    from sklearn.exceptions import ConvergenceWarning
    from sklearn.linear_model import ElasticNet

    from unirec_tpu.models.solvers import SLIM

    rng = np.random.default_rng(0)
    U, N = 400, 150
    A = (rng.random((U, N)) < 0.05).astype(np.float32)
    l1, l2, iters = 0.004, 0.098, 200

    # reference slim.py:33-64 semantics, verbatim
    alpha = 2 * l2 + l1
    model = ElasticNet(alpha=alpha, l1_ratio=l1 / alpha, positive=True,
                       fit_intercept=False, copy_X=False, precompute=True,
                       selection="random", max_iter=iters, tol=1e-4,
                       random_state=0)
    X = ssp.csr_matrix(A).tolil()
    cols = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=ConvergenceWarning)
        for j in range(N):
            r = X[:, j]
            X[:, j] = 0
            model.fit(X, r.toarray())
            cols.append(np.asarray(model.sparse_coef_.todense()).ravel())
            X[:, j] = r
    W_ref = np.stack(cols).T

    W_ours = SLIM._solve_full(A.T @ A, float(U), l1, l2, iters)

    # same support up to a few borderline coefficients: at tol=1e-4 sklearn
    # may leave a coefficient our CD drives to ~1e-6 (or vice versa) at
    # exactly zero; any such flip must also be tiny in value
    support_flips = int(np.sum((W_ref > 0) != (W_ours > 0)))
    assert support_flips <= 3, support_flips
    np.testing.assert_allclose(W_ours, W_ref, atol=2e-3)

    def obj(W):
        R = A - A @ W
        return (0.5 / U * np.sum(R * R) + l1 * np.abs(W).sum()
                + l2 * np.sum(W * W))

    np.testing.assert_allclose(obj(W_ours), obj(W_ref), rtol=1e-5)
