"""Workload-level tests: the BASELINE.json configs end-to-end."""
import numpy as np
import pytest

from admmsolver_tpu import SimpleOptimizer
from admmsolver_tpu.models.applications import (
    basis_pursuit_model,
    lasso_model,
    sdp_model,
    spm_model,
    synthetic_spm_data,
)


def test_basis_pursuit_builder():
    rng = np.random.RandomState(0)
    M, N = 20, 50
    A = rng.randn(M, N)
    xt = np.zeros(N)
    xt[:5] = rng.randn(5)
    y = A @ xt
    opt = SimpleOptimizer(basis_pursuit_model(A, y, 0.1))
    opt.solve(300)
    np.testing.assert_allclose(np.asarray(opt.x[0]).real, xt,
                               atol=1e-2 * np.abs(xt).max())


def test_elastic_net_builder():
    rng = np.random.RandomState(1)
    M, N = 15, 10
    A = rng.randn(M, N)
    y = rng.randn(M)
    m = lasso_model(A, y, alpha_l1=0.1, alpha_l2=0.5)
    assert m.num_func == 3
    opt = SimpleOptimizer(m)
    opt.solve(2000)
    x = np.asarray(opt.x[0]).real
    # oracle: scipy on the smooth part is hard with L1; check optimality
    # via the subgradient condition of
    #   |y-Ax|^2 + a1 |x|_1 + a2 |x|^2
    g_smooth = -2 * A.T @ (y - A @ x) + 2 * 0.5 * x
    inside = np.abs(x) < 1e-8
    # where x != 0: gradient + a1 sign(x) == 0
    np.testing.assert_allclose(
        g_smooth[~inside], -0.1 * np.sign(x[~inside]), atol=1e-4)
    # where x == 0: |gradient| <= a1
    assert np.all(np.abs(g_smooth[inside]) <= 0.1 + 1e-6)


def test_nonneg_lasso_builder():
    rng = np.random.RandomState(2)
    M, N = 12, 8
    A = rng.randn(M, N)
    y = A @ np.abs(rng.randn(N))
    m = lasso_model(A, y, alpha_l1=0.05, nonneg=True)
    assert m.num_func == 3
    opt = SimpleOptimizer(m)
    opt.solve(2000)
    assert np.all(np.asarray(opt.x[2]).real >= -1e-10)


def test_spm_analytic_continuation():
    """The SpM workload (spm.ipynb): recover a nonnegative unit-weight
    spectrum from noisy kernel data."""
    s, g, prj_sum, prj_w, omega, rho_dw = synthetic_spm_data(
        nl=20, nw=41, noise=1e-6)
    m = spm_model(s, g, prj_sum, prj_w, alpha_l1=1e-6, sum_value=1.0)
    opt = SimpleOptimizer(m, mu=0.1)
    opt.solve(4000)

    rho_est = np.asarray(opt.x[2]).real  # nonnegative block = spectrum
    # residuals decreased
    assert opt._primal_residual[-1] < opt._primal_residual[0]
    # sum rule within ADMM tolerance
    assert abs(rho_est.sum() - 1.0) < 0.05
    # nonnegative
    assert rho_est.min() > -1e-8
    # correlation with ground truth spectrum
    c = np.corrcoef(rho_est, rho_dw)[0, 1]
    assert c > 0.9, c


def test_sdp_workload():
    """PSD-constrained quadratic: the solution's slices are PSD and fit
    the data."""
    rng = np.random.RandomState(3)
    n, K = 4, 3
    N = n * n * K
    # ground truth: PSD slices
    xt = np.zeros((n, n, K))
    for k in range(K):
        R = rng.randn(n, n)
        xt[:, :, k] = R @ R.T / n
    M = 2 * N
    A = rng.randn(M, N)
    y = A @ xt.ravel()
    m = sdp_model(A, y, (n, n, K), axis=2)
    opt = SimpleOptimizer(m)
    opt.solve(1500)
    x = np.asarray(opt.x[1]).real.reshape(n, n, K)
    for k in range(K):
        evals = np.linalg.eigvalsh(0.5 * (x[:, :, k] + x[:, :, k].T))
        assert evals.min() > -1e-8
    np.testing.assert_allclose(x, xt, atol=5e-2)


def test_sdp_with_l1():
    rng = np.random.RandomState(4)
    n, K = 3, 2
    N = n * n * K
    A = rng.randn(2 * N, N)
    y = rng.randn(2 * N)
    m = sdp_model(A, y, (n, n, K), axis=2, alpha_l1=0.1)
    assert m.num_func == 3
    opt = SimpleOptimizer(m)
    opt.solve(500)
    assert np.isfinite(np.asarray(opt.x[0]).real).all()
