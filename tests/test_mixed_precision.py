"""Mixed-precision phases and absolute-residual stopping."""
import numpy as np
import jax.numpy as jnp

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            SimpleOptimizer, identity)
from admmsolver_tpu.parallel import BatchedSolver


def _template(A, y, alpha=0.1):
    N = A.shape[1]
    return Model([LeastSquares(1.0, A, y), L1Regularizer(alpha, N)],
                 [(1, 0, identity(N), identity(N))])


def _setup(B=6, M=30, N=80, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 6, replace=False)] = rng.randn(6)
    ys = xt @ A.T
    return A, ys, xt


def test_f32_phase_stays_f32():
    A, ys, _ = _setup()
    bs = BatchedSolver(_template(A, ys[0]), dtype=jnp.float64)
    r = bs.solve({(0, "y"): ys}, niter=50, dtype=jnp.float32)
    assert r.x[0].dtype == jnp.float32
    assert r.h[0].dtype == jnp.float32
    assert np.isfinite(np.asarray(r.x[0])).all()


def test_atol_stop():
    """atol stops on absolute primal+dual residual (engine extension)."""
    A, ys, _ = _setup()
    bs = BatchedSolver(_template(A, ys[0]), dtype=jnp.float64)
    r = bs.solve({(0, "y"): ys}, niter=5000, atol=1e-8)
    assert np.asarray(r.converged).all()
    for b in range(ys.shape[0]):
        hist = np.asarray(r.primal_residual[b])
        hist = hist[np.isfinite(hist)]
        assert hist[-1] < 1e-8


def test_mixed_matches_pure_f64():
    A, ys, xt = _setup()
    bs = BatchedSolver(_template(A, ys[0]), dtype=jnp.float64)
    rm = bs.solve_mixed({(0, "y"): ys}, niter_low=500, niter=4000,
                        atol=1e-10)
    rf = bs.solve({(0, "y"): ys}, niter=5000, atol=1e-10)
    assert np.asarray(rm.converged).all()
    np.testing.assert_allclose(np.asarray(rm.x[0]), np.asarray(rf.x[0]),
                               atol=1e-8)
    # history concatenation bookkeeping
    assert rm.primal_residual.shape[1] == 500 + 4000


def test_atol_single_instance():
    A, ys, _ = _setup(B=1)
    opt = SimpleOptimizer(_template(A, ys[0]))
    opt.solve(5000, atol=1e-9)
    assert opt._primal_residual[-1] < 1e-9
    assert len(opt._primal_residual) < 5000


def test_f32_single_phase_accuracy():
    """An f32 phase alone reaches ~1e-5 recovery quality."""
    A, ys, xt = _setup()
    bs = BatchedSolver(_template(A, ys[0]))
    r = bs.solve({(0, "y"): ys}, niter=2000, dtype=jnp.float32, rtol=1e-6)
    err = np.abs(np.asarray(r.x[0], dtype=np.float64) - xt).max()
    assert err < 5e-2, err
