"""End-to-end ADMM tests: the reference's correctness anchors
(``/root/reference/test/test_optimizer.py``) plus engine-specific checks
(warm start, repeated solve, callback, residual API, convergence)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from admmsolver_tpu import (
    DiagonalMatrix,
    EqualityCondition,
    L1Regularizer,
    L2Regularizer,
    LeastSquares,
    Model,
    NonNegativePenalty,
    Problem,
    SimpleOptimizer,
    identity,
)


def _randn_cmplx(rng, *shape):
    return rng.randn(*shape) + 1j * rng.randn(*shape)


def test_LASSO():
    """2-var LASSO vs Nelder-Mead oracle (reference
    test_optimizer.py:13-50)."""
    y = np.array([2.0])
    A = np.array([[2.0, 1.0]])
    alpha = 0.1

    f = lambda x: np.linalg.norm(y - A @ x) ** 2 + alpha * np.sum(np.abs(x))
    res = minimize(f, x0=np.array([1.1, 0]), method="Nelder-Mead",
                   options={"xatol": 1e-10})
    assert res.success
    x_ref = res.x

    lstsq = LeastSquares(1.0, A, y)
    l1 = L1Regularizer(alpha, A.shape[1])
    p = Model([lstsq, l1], [(1, 0, identity(2), identity(2))])
    opt = SimpleOptimizer(p)

    assert np.abs(opt(2 * [x_ref]) - f(x_ref)) < 1e-10
    opt.solve(100)
    for x in opt.x:
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-10)


def test_basis_pursuit():
    """N=1000 M=100 K=20 sparse recovery in 100 iterations (reference
    test_optimizer.py:52-82)."""
    N, M, K = 1000, 100, 20
    np.random.seed(1234)
    A = np.random.randn(M, N)
    xanswer = np.zeros(N)
    xanswer[:K] = np.random.randn(K)
    xanswer = np.random.permutation(xanswer)
    y = A @ xanswer

    p = Model(
        [LeastSquares(1.0, A, y), L1Regularizer(1e-1, N)],
        [(1, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(p)
    opt.solve(100)
    np.testing.assert_allclose(
        np.asarray(opt.x[0]), xanswer,
        atol=1e-2 * np.abs(xanswer).max(), rtol=0)
    # residual histories recorded per iteration (optimizer.py:312-314)
    assert len(opt._primal_residual) == len(opt._dual_residual)
    assert 0 < len(opt._primal_residual) <= 100
    assert np.all(np.isfinite(opt._primal_residual))


def test_ridge():
    """Closed-form ridge match (reference test_optimizer.py:85-109)."""
    rng = np.random.RandomState(100)
    N1, N2, N3 = 2, 2, 1
    y = _randn_cmplx(rng, N1)
    A = _randn_cmplx(rng, N1, N2)
    B = _randn_cmplx(rng, N3, N2)
    alpha = 1.0

    model = Model(
        [LeastSquares(1.0, A, y), L2Regularizer(alpha, B)],
        [(1, 0, identity(N2), identity(N2))])
    opt = SimpleOptimizer(model)
    opt.solve(niter=100, update_h=True)
    x_ref = (np.linalg.inv(A.conj().T @ A + alpha * B.conj().T @ B)
             @ A.conj().T @ y)
    np.testing.assert_allclose(np.asarray(opt.x[0]), x_ref,
                               atol=np.abs(x_ref).max() * 1e-8)


def test_three_block_nonneg_lasso():
    """Three-block model: LS + L1 + NonNegative, adaptive mu; solution must
    be the nonnegative LASSO minimizer (oracle via scipy on the
    constrained problem)."""
    rng = np.random.RandomState(5)
    M, N = 6, 4
    A = rng.randn(M, N)
    xtrue = np.abs(rng.randn(N))
    xtrue[2:] = 0.0
    y = A @ xtrue + 0.01 * rng.randn(M)
    alpha = 0.1

    p = Model(
        [LeastSquares(1.0, A, y), L1Regularizer(alpha, N),
         NonNegativePenalty(N)],
        [(1, 0, identity(N), identity(N)),
         (2, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(p)
    opt.solve(2000)

    f = lambda x: np.linalg.norm(y - A @ x) ** 2 + alpha * np.sum(np.abs(x))
    res = minimize(f, np.maximum(np.asarray(opt.x[0]).real, 0),
                   method="Nelder-Mead",
                   bounds=[(0, None)] * N,
                   options={"xatol": 1e-12, "fatol": 1e-14,
                            "maxiter": 100000})
    x_ref = res.x
    np.testing.assert_allclose(np.asarray(opt.x[0]).real, x_ref, atol=1e-5)
    assert np.all(np.asarray(opt.x[2]).real >= -1e-12)


def test_equality_condition_validation():
    with pytest.raises(AssertionError):
        EqualityCondition(0, 0, np.eye(2), np.eye(2))  # i1 == i2
    with pytest.raises(AssertionError):
        EqualityCondition(0, 1, np.eye(2), np.eye(3))  # mismatched rows
    # duplicate pair rejected (optimizer.py:111-112)
    fns = [L1Regularizer(1.0, 2), L1Regularizer(1.0, 2)]
    with pytest.raises(RuntimeError):
        Model(fns, [(0, 1, identity(2), identity(2)),
                    (0, 1, identity(2), identity(2))])


def test_problem_alias():
    assert Problem is Model


def test_warm_start_and_repeated_solve():
    """x0 warm start (optimizer.py:146-149) and history accumulation over
    repeated solve() calls."""
    rng = np.random.RandomState(0)
    N, M = 8, 4
    A = rng.randn(M, N)
    y = rng.randn(M)
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
              [(1, 0, identity(N), identity(N))])

    opt = SimpleOptimizer(p)
    opt.solve(50)
    n1 = len(opt._primal_residual)
    opt.solve(50)
    assert len(opt._primal_residual) >= n1

    x_sol = [np.asarray(x) for x in opt.x]
    opt2 = SimpleOptimizer(p, x0=x_sol)
    for a, b in zip(opt2.x, x_sol):
        np.testing.assert_allclose(np.asarray(a), b)


def test_callback_and_early_exit():
    y = np.array([2.0])
    A = np.array([[2.0, 1.0]])
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, 2)],
              [(1, 0, identity(2), identity(2))])
    opt = SimpleOptimizer(p)
    calls = []
    opt.solve(100, callback=lambda: calls.append(1))
    # callback ran once per executed iteration (optimizer.py:315-316)
    assert len(calls) == len(opt._primal_residual)
    # converged well before the cap at rtol=1e-12
    assert len(calls) < 100


def test_one_sweep_residual_api():
    """Public one_sweep/residual/update_mu/check_convergence parity
    (optimizer.py:232-341)."""
    rng = np.random.RandomState(1)
    N, M = 6, 3
    A = rng.randn(M, N)
    y = rng.randn(M)
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
              [(1, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(p)

    with pytest.raises(RuntimeError):
        opt.residual()

    opt.one_sweep(update_h=True)
    primal, dual = opt.residual()
    assert primal >= 0 and dual >= 0
    assert not opt.check_convergence(1e-12)
    mu_before = np.asarray(opt.mu).copy()
    opt.update_mu()
    assert np.all(np.asarray(opt.mu) <= 1e3)
    assert np.asarray(opt.mu).shape == mu_before.shape


def test_mu_adaptation_clamped():
    """mu stays clamped at max_mu (optimizer.py:299)."""
    rng = np.random.RandomState(2)
    N, M = 4, 2
    A = rng.randn(M, N)
    y = 100.0 * rng.randn(M)
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.01, N)],
              [(1, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(p, max_mu=4.0)
    opt.solve(500, interval_update_mu=10)
    assert np.all(np.asarray(opt.mu) <= 4.0)


def test_update_h_false_keeps_duals():
    rng = np.random.RandomState(3)
    N, M = 4, 2
    A = rng.randn(M, N)
    y = rng.randn(M)
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
              [(1, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(p)
    opt.solve(5, update_h=False)
    for h in opt.h:
        np.testing.assert_allclose(np.asarray(h), 0.0)


def test_diagonal_coupling():
    """Non-identity (diagonal) coupling operators exercise the structured
    EcE/EcE2 precompute path.  The expected solution and iteration count
    are the reference implementation's output on this exact problem (the
    reference ADMM's fixed point here differs slightly from the true
    minimizer — we preserve its semantics; see test_reference_parity.py
    for the live comparison)."""
    rng = np.random.RandomState(4)
    N, M = 5, 3
    A = rng.randn(M, N)
    y = rng.randn(M)
    d = jnp.asarray(1.0 + np.abs(rng.randn(N)))
    E1 = DiagonalMatrix(d)

    # min |y-Ax|^2 + alpha |D x|_1  via  z = D x
    p = Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
              [(1, 0, E1, identity(N))])
    opt = SimpleOptimizer(p)
    opt.solve(20000)
    x = np.asarray(opt.x[0]).real

    # Reference output (SpM-lab/admmsolver v0.7.6) on this problem:
    x_ref = np.array([9.55428256e-01, 0.0, 1.66770055e-02, 0.0,
                      -7.83566306e-01])
    np.testing.assert_allclose(x, x_ref, atol=1e-7)
    assert len(opt._primal_residual) == 48  # same early-exit iteration
    # coupling satisfied: the condition (1, 0, E1, I) means D x1 == x0
    np.testing.assert_allclose(np.asarray(d) * np.asarray(opt.x[1]).real,
                               x, atol=1e-10)


class TestOverRelaxation:
    """Opt-in over-relaxation (ADMMConfig.relax; engine extension, no
    reference counterpart).  Fixed points are preserved exactly — the
    relaxed and plain constraint images coincide at any feasible point —
    so the oracle solutions must match; the win is iteration count."""

    def _bp(self, seed=44):
        rng = np.random.RandomState(seed)
        M, N = 40, 120
        A = rng.randn(M, N)
        xt = np.zeros(N)
        xt[rng.choice(N, 6, replace=False)] = rng.randn(6)
        y = A @ xt
        from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                    identity)
        m = Model([LeastSquares(1.0, A, y), L1Regularizer(0.05, N)],
                  [(1, 0, identity(N), identity(N))])
        return m, xt

    def test_same_fixed_point_fewer_iterations(self):
        """Classic regime (fixed mu): relax=1.8 converges to the SAME
        solution in substantially fewer iterations (measured 736 -> 407
        at mu=10 on this problem; with adaptive mu the interaction with
        residual balancing is workload-dependent, so the knob is off by
        default)."""
        from admmsolver_tpu import SimpleOptimizer

        m, xt = self._bp()
        kw = dict(rtol=0.0, atol=1e-9, interval_update_mu=10**9)
        plain = SimpleOptimizer(m, mu=10.0)
        plain.solve(6000, **kw)
        relaxed = SimpleOptimizer(m, mu=10.0)
        relaxed.solve(6000, relax=1.8, **kw)
        np.testing.assert_allclose(np.asarray(relaxed.x[0]),
                                   np.asarray(plain.x[0]), atol=1e-7)
        assert relaxed.iterations < 0.7 * plain.iterations, (
            relaxed.iterations, plain.iterations)

    def test_relax_default_bitwise_unchanged(self):
        """relax=1.0 compiles the identical sweep: bitwise-equal
        trajectories with an explicit relax=1.0 vs the default."""
        from admmsolver_tpu import SimpleOptimizer

        m, _ = self._bp(45)
        a = SimpleOptimizer(m)
        a.solve(120, rtol=0.0)
        b = SimpleOptimizer(m)
        b.solve(120, rtol=0.0, relax=1.0)
        np.testing.assert_array_equal(np.asarray(a.x[0]),
                                      np.asarray(b.x[0]))

    def test_batched_relax_two_block_and_multi_pair_rejected(self):
        """Relaxation through the batched driver lands on the plain
        fixed point (2-block); multi-pair models raise at trace time
        (measured round 5: both star and chain topologies stall at
        ~1e-4 under relaxation while plain converges)."""
        import jax.numpy as jnp
        from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                    NonNegativePenalty, identity)
        from admmsolver_tpu.parallel import BatchedSolver

        rng = np.random.RandomState(46)
        M, N, B = 20, 30, 3
        A = rng.randn(M, N)
        xt = np.zeros((B, N))
        for b in range(B):
            xt[b, rng.choice(N, 4, replace=False)] = rng.randn(4)
        ys = xt @ A.T
        m = Model([LeastSquares(1.0, A, ys[0]), L1Regularizer(0.02, N)],
                  [(1, 0, identity(N), identity(N))])
        bs = BatchedSolver(m)
        ov = {(0, "y"): jnp.asarray(ys)}
        # interval == niter => penalty adapts only at iteration 0 (the
        # batched driver's chunk scan has length `interval`, so a huge
        # sentinel interval would actually run that many masked steps)
        kw = dict(niter=6000, rtol=0.0, atol=1e-8,
                  record_residuals=False, mu0=10.0,
                  interval_update_mu=6000)
        plain = bs.solve(ov, **kw)
        rel = bs.solve(ov, relax=1.8, **kw)
        assert np.asarray(rel.converged).all()
        np.testing.assert_allclose(np.asarray(rel.x[0]),
                                   np.asarray(plain.x[0]), atol=1e-6)
        assert (np.asarray(rel.iterations).sum()
                < 0.7 * np.asarray(plain.iterations).sum())

        m3 = Model(
            [LeastSquares(1.0, A, ys[0]), L1Regularizer(0.02, N),
             NonNegativePenalty(N)],
            [(1, 0, identity(N), identity(N)),
             (2, 0, identity(N), identity(N))])
        with pytest.raises(ValueError, match="single-pair"):
            BatchedSolver(m3).solve(ov, niter=10, relax=1.6)
