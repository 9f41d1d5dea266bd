"""Large-N operator sharding on the 8-virtual-device CPU mesh: the
sharded single-instance solve must match the unsharded engine, and the
row-sharded Gram must match the dense computation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            NonNegativePenalty, SimpleOptimizer, identity)
from admmsolver_tpu.parallel import make_mesh
from admmsolver_tpu.parallel.rowshard import (LargeNTwoBlockSolver,
                                              sharded_gram)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(axis_name="n")


def test_sharded_gram_matches_dense(mesh):
    rng = np.random.RandomState(0)
    ndev = mesh.devices.size
    M, N = 4 * ndev, 24
    A = rng.randn(M, N)
    y = rng.randn(M)
    G, r = sharded_gram(A, y, mesh)
    np.testing.assert_allclose(np.asarray(G), A.T @ A, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r), A.T @ y, atol=1e-12)
    # the replicated results are usable on every device
    assert np.asarray(G).shape == (N, N)


def test_large_n_solver_matches_engine(mesh):
    """Feature-sharded basis pursuit == unsharded SimpleOptimizer,
    trajectory for trajectory (same iteration count through adaptive-mu
    boundaries)."""
    rng = np.random.RandomState(1)
    ndev = mesh.devices.size
    M, N = 24, 16 * ndev
    A = rng.randn(M, N)
    xt = np.zeros(N)
    xt[rng.choice(N, 6, replace=False)] = rng.randn(6)
    y = A @ xt

    sol = LargeNTwoBlockSolver(A, mesh, prox="l1", alpha1=0.1)
    res = sol.solve(y, niter=300, rtol=0.0)
    # the state is genuinely sharded over the mesh
    assert res.x0.sharding.num_devices == ndev

    m = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
              [(1, 0, identity(N), identity(N))])
    o = SimpleOptimizer(m)
    o.solve(300, rtol=0.0)

    np.testing.assert_allclose(np.asarray(res.x0), np.asarray(o.x[0]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.x1), np.asarray(o.x[1]),
                               atol=1e-9)
    np.testing.assert_allclose(float(res.mu), float(np.asarray(o.mu)[0]),
                               rtol=1e-12)
    pb = np.asarray(res.primal_residual)[:res.iterations]
    np.testing.assert_allclose(pb, o._primal_residual, rtol=1e-8,
                               atol=1e-13)


def test_large_n_solver_nonneg_and_early_exit(mesh):
    rng = np.random.RandomState(2)
    ndev = mesh.devices.size
    M, N = 20, 8 * ndev
    A = rng.randn(M, N)
    xt = np.abs(rng.randn(N)) * (rng.rand(N) < 0.2)
    y = A @ xt

    sol = LargeNTwoBlockSolver(A, mesh, prox="nonneg")
    res = sol.solve(y, niter=8000, atol=1e-9)
    assert res.converged
    assert res.iterations < 8000
    assert np.asarray(res.x1).min() >= 0.0

    m = Model([LeastSquares(1.0, A, y), NonNegativePenalty(N)],
              [(1, 0, identity(N), identity(N))])
    o = SimpleOptimizer(m)
    o.solve(int(res.iterations), rtol=0.0)
    np.testing.assert_allclose(np.asarray(res.x0), np.asarray(o.x[0]),
                               atol=1e-8)
