"""Live parity tests against the reference implementation.

Imports SpM-lab/admmsolver from ``/root/reference/src`` (read-only, used
purely as a numerical oracle; skipped when unavailable) and checks that the
TPU engine reproduces its solutions AND its residual trajectories on the
anchor workloads (SURVEY.md §4: reference-parity idiom)."""
import sys

import numpy as np
import pytest


REF_PATH = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    try:
        import admmsolver.optimizer as ref_opt  # noqa: F401
        import admmsolver.objectivefunc as ref_obj  # noqa: F401
        import admmsolver.matrix as ref_mat  # noqa: F401
    except ImportError:
        pytest.skip("reference implementation not available")
    finally:
        sys.path.remove(REF_PATH)
    import types

    ns = types.SimpleNamespace(opt=ref_opt, obj=ref_obj, mat=ref_mat)
    return ns


def _run_ref(ref, A, y, alpha_l1, niter, mu0=None):
    lstsq = ref.obj.LeastSquares(1.0, A, y)
    l1 = ref.obj.L1Regularizer(alpha_l1, A.shape[1])
    p = ref.opt.Model(
        [lstsq, l1],
        [(1, 0, ref.mat.identity(A.shape[1]), ref.mat.identity(A.shape[1]))])
    o = ref.opt.SimpleOptimizer(p, mu=mu0)
    o.solve(niter)
    return o


def _run_tpu(A, y, alpha_l1, niter, mu0=None):
    from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                SimpleOptimizer, identity)

    p = Model(
        [LeastSquares(1.0, A, y), L1Regularizer(alpha_l1, A.shape[1])],
        [(1, 0, identity(A.shape[1]), identity(A.shape[1]))])
    o = SimpleOptimizer(p, mu=mu0)
    o.solve(niter)
    return o


def test_lasso_trajectory_parity(ref):
    y = np.array([2.0])
    A = np.array([[2.0, 1.0]])
    r = _run_ref(ref, A, y, 0.1, 100)
    t = _run_tpu(A, y, 0.1, 100)
    assert len(r._primal_residual) == len(t._primal_residual)
    np.testing.assert_allclose(t._primal_residual, r._primal_residual,
                               rtol=1e-6, atol=1e-13)
    np.testing.assert_allclose(t._dual_residual, r._dual_residual,
                               rtol=1e-6, atol=1e-13)
    np.testing.assert_allclose(np.asarray(t.x[0]), r.x[0], atol=1e-12)


def test_basis_pursuit_parity(ref):
    N, M, K = 300, 40, 10
    rng = np.random.RandomState(1234)
    A = rng.randn(M, N)
    xa = np.zeros(N)
    xa[:K] = rng.randn(K)
    xa = rng.permutation(xa)
    y = A @ xa
    r = _run_ref(ref, A, y, 0.1, 100)
    t = _run_tpu(A, y, 0.1, 100)
    assert len(r._primal_residual) == len(t._primal_residual)
    np.testing.assert_allclose(np.asarray(t.x[0]), r.x[0], atol=1e-8)
    np.testing.assert_allclose(t._primal_residual, r._primal_residual,
                               rtol=1e-5, atol=1e-12)


def test_ridge_parity(ref):
    rng = np.random.RandomState(100)
    rc = lambda *s: rng.randn(*s) + 1j * rng.randn(*s)
    y = rc(2)
    A = rc(2, 2)
    B = rc(1, 2)

    rp = ref.opt.Model(
        [ref.obj.LeastSquares(1.0, A, y), ref.obj.L2Regularizer(1.0, B)],
        [(1, 0, ref.mat.identity(2), ref.mat.identity(2))])
    ro = ref.opt.SimpleOptimizer(rp)
    ro.solve(100)

    from admmsolver_tpu import (L2Regularizer, LeastSquares, Model,
                                SimpleOptimizer, identity)

    tp = Model([LeastSquares(1.0, A, y), L2Regularizer(1.0, B)],
               [(1, 0, identity(2), identity(2))])
    to = SimpleOptimizer(tp)
    to.solve(100)
    np.testing.assert_allclose(np.asarray(to.x[0]), ro.x[0], atol=1e-10)
    assert len(to._primal_residual) == len(ro._primal_residual)


def test_three_block_parity(ref):
    """LS + L1 + NonNegative with adaptive penalties: trajectories and
    adapted mu values must match the reference."""
    rng = np.random.RandomState(5)
    M, N = 6, 4
    A = rng.randn(M, N)
    y = A @ np.abs(rng.randn(N)) + 0.01 * rng.randn(M)

    rp = ref.opt.Model(
        [ref.obj.LeastSquares(1.0, A, y), ref.obj.L1Regularizer(0.1, N),
         ref.obj.NonNegativePenalty(N)],
        [(1, 0, ref.mat.identity(N), ref.mat.identity(N)),
         (2, 0, ref.mat.identity(N), ref.mat.identity(N))])
    ro = ref.opt.SimpleOptimizer(rp)
    ro.solve(500)

    from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                NonNegativePenalty, SimpleOptimizer, identity)

    tp = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N),
                NonNegativePenalty(N)],
               [(1, 0, identity(N), identity(N)),
                (2, 0, identity(N), identity(N))])
    to = SimpleOptimizer(tp)
    to.solve(500)

    assert len(to._primal_residual) == len(ro._primal_residual)
    np.testing.assert_allclose(np.asarray(to.x[0]), ro.x[0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(to.x[2]), ro.x[2], atol=1e-8)
    # adapted penalties agree: reference stores mu in an (n,n) matrix at
    # (i,j), i>j (optimizer.py:154-160); ours is ordered by Model.pairs
    ref_mu = [ro._mu[i, j] for (i, j) in [(1, 0), (2, 0)]]
    np.testing.assert_allclose(np.asarray(to.mu), ref_mu, rtol=1e-12)


def test_mu0_override_parity(ref):
    y = np.array([2.0])
    A = np.array([[2.0, 1.0]])
    r = _run_ref(ref, A, y, 0.1, 60, mu0=0.25)
    t = _run_tpu(A, y, 0.1, 60, mu0=0.25)
    np.testing.assert_allclose(np.asarray(t.x[0]), r.x[0], atol=1e-12)
    assert len(r._primal_residual) == len(t._primal_residual)
