"""Batched complex/constrained workloads: per-frequency SpM batches and
complex-dtype batched solves (the reference's complex128-first semantics
under batching)."""
import numpy as np
import jax.numpy as jnp

from admmsolver_tpu import (L2Regularizer, LeastSquares, Model,
                            SimpleOptimizer, identity)
from admmsolver_tpu.models.applications import spm_model, synthetic_spm_data
from admmsolver_tpu.parallel import BatchedSolver


def test_batched_spm_per_frequency():
    """BASELINE config #3: batched per-dataset SpM solves sharing the
    kernel; every lane keeps the sum rule and nonnegativity."""
    s, g, prj_sum, prj_w, omega, rho_dw = synthetic_spm_data(
        nl=16, nw=33, noise=1e-6)
    m = spm_model(s, g, prj_sum, prj_w, alpha_l1=1e-6)
    bs = BatchedSolver(m)
    B = 4
    rng = np.random.RandomState(0)
    gs = np.stack([g + 1e-6 * rng.randn(g.size) for _ in range(B)])
    res = bs.solve({(0, "y"): gs}, mu0=0.1, niter=1500)
    rho = np.asarray(res.x[2]).real
    np.testing.assert_allclose(rho.sum(axis=1), 1.0, atol=1e-4)
    assert rho.min() >= -1e-10
    # ConstrainedLeastSquares D override batches too
    res2 = bs.solve({(0, "y"): gs,
                     (0, "D"): np.linspace(0.9, 1.2, B)[:, None]},
                    mu0=0.1, niter=800)
    rho2 = np.asarray(res2.x[2]).real
    # each lane honors its own sum rule (within ADMM coupling tolerance)
    np.testing.assert_allclose(
        np.asarray(res2.x[0] @ np.asarray(
            m.functions[0]._C.asmatrix()).T).real.ravel(),
        np.linspace(0.9, 1.2, B), atol=1e-6)


def test_batched_complex_matches_single():
    rng = np.random.RandomState(1)
    rc = lambda *sh: rng.randn(*sh) + 1j * rng.randn(*sh)
    M, N, B = 8, 12, 3
    A = rc(M, N)
    Breg = rc(4, N)
    ys = rc(B, M)
    mc = Model([LeastSquares(1.0, A, ys[0]), L2Regularizer(0.5, Breg)],
               [(1, 0, identity(N), identity(N))])
    res = BatchedSolver(mc).solve({(0, "y"): ys}, niter=200)
    assert res.x[0].dtype == jnp.complex128
    for b in range(B):
        m1 = Model([LeastSquares(1.0, A, ys[b]), L2Regularizer(0.5, Breg)],
                   [(1, 0, identity(N), identity(N))])
        o = SimpleOptimizer(m1)
        o.solve(200)
        np.testing.assert_allclose(np.asarray(res.x[0][b]),
                                   np.asarray(o.x[0]), atol=1e-9)
