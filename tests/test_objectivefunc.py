"""Objective/prox oracle tests (reference idiom #1: verify each prox against
a generic scipy optimizer, ``/root/reference/test/test_objectivefunc.py``)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from admmsolver_tpu import (
    ConstrainedLeastSquares,
    L1Regularizer,
    L2Regularizer,
    LeastSquares,
    NonNegativePenalty,
    SemiPositiveDefinitePenalty,
    ScaledIdentityMatrix,
    PartialDiagonalMatrix,
    identity,
    asmatrixtype,
)


def _randn_cmplx(rng, *shape):
    return rng.randn(*shape) + 1j * rng.randn(*shape)


def _to_real_array(x):
    if np.iscomplexobj(x):
        return np.ascontiguousarray(x).view(np.float64).ravel()
    return x


def _from_real_array(x):
    x = x.reshape((-1, 2))
    x = x.view(np.complex128)
    return x.reshape(x.shape[0:-1])


def _minimize(f, x0, method="BFGS"):
    x0 = _to_real_array(np.asarray(x0))
    res = minimize(lambda x: f(_from_real_array(x)), x0, method=method,
                   options={"maxiter": 100000})
    return _from_real_array(res.x)


def test_least_squares():
    rng = np.random.RandomState(100)
    N1, N2 = 4, 2
    alpha = 2.0
    y = _randn_cmplx(rng, N1)
    A = _randn_cmplx(rng, N1, N2)
    h = _randn_cmplx(rng, N2)
    sqrt_mu = _randn_cmplx(rng, N2, N2)
    mu = asmatrixtype(sqrt_mu.T.conj() @ sqrt_mu)
    lstsq = LeastSquares(alpha, A, y)
    x = np.asarray(lstsq.solve(h, mu))

    def f_all(x):
        return np.real(alpha * np.linalg.norm(y - A @ x) ** 2 +
                       h.T.conj() @ x + x.T.conj() @ h +
                       x.conj().T @ (np.asarray(mu.asmatrix()) @ x))

    x_ref = _minimize(f_all, x)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8)
    np.testing.assert_allclose(f_all(x), f_all(x_ref), rtol=1e-8)


def test_least_squares_partial():
    """LeastSquares with a Kronecker (PartialDiagonal) coefficient matrix."""
    rng = np.random.RandomState(100)
    N1, N2 = 40, 20
    alpha = 2.0
    rest = 20
    y = _randn_cmplx(rng, N1)
    A = PartialDiagonalMatrix(_randn_cmplx(rng, N1 // rest, N2 // rest),
                              rest_dims=(rest,))
    assert A.shape == (N1, N2)
    h = _randn_cmplx(rng, N2)
    sqrt_mu = _randn_cmplx(rng, N2, N2)
    mu = asmatrixtype(sqrt_mu.T.conj() @ sqrt_mu)
    lstsq = LeastSquares(alpha, A, y)
    x = np.asarray(lstsq.solve(h, mu))
    Ad = np.asarray(A.asmatrix())

    def f_all(x):
        return np.real(alpha * np.linalg.norm(y - Ad @ x) ** 2 +
                       h.T.conj() @ x + x.T.conj() @ h +
                       x.conj().T @ (np.asarray(mu.asmatrix()) @ x))

    x_ref = _minimize(f_all, x)
    np.testing.assert_allclose(x, x_ref, rtol=1e-4)
    np.testing.assert_allclose(f_all(x), f_all(x_ref), rtol=1e-8)


def test_least_squares_cache():
    """Eager-path factorization cache keyed on the penalty hash
    (reference objectivefunc.py:89-96)."""
    rng = np.random.RandomState(0)
    A = rng.randn(4, 3)
    y = rng.randn(4)
    ls = LeastSquares(1.0, A, y)
    mu = identity(3)
    ls.solve(np.zeros(3), mu)
    key0 = ls._B_cache[0]
    ls.solve(np.ones(3), identity(3))
    assert ls._B_cache[0] == key0  # same mu -> cache hit
    ls.solve(np.ones(3), ScaledIdentityMatrix(3, 2.0))
    assert ls._B_cache[0] != key0  # changed mu -> refactorized


def test_constrained_least_squares():
    rng = np.random.RandomState(100)
    N1, N2, Nc = 8, 4, 2
    alpha = 2.0
    y = _randn_cmplx(rng, N1)
    A = _randn_cmplx(rng, N1, N2)
    h = _randn_cmplx(rng, N2)
    C = _randn_cmplx(rng, Nc, N2)
    D = _randn_cmplx(rng, Nc)
    sqrt_mu = _randn_cmplx(rng, N2, N2)
    mu = asmatrixtype(sqrt_mu.T.conj() @ sqrt_mu)
    lstsq = ConstrainedLeastSquares(alpha, A, y, C, D)
    x = np.asarray(lstsq.solve(h, mu))
    # Constraint satisfied exactly (reference checks 1e-10,
    # test_objectivefunc.py:100-101)
    assert np.abs(C @ x - D).max() < 1e-10

    # Optimality among feasible points: project the gradient of the
    # objective onto the nullspace of C — must vanish.
    Bmat = np.asarray(mu.asmatrix())
    grad = (-2 * alpha * A.conj().T @ (y - A @ x) + 2 * h + 2 * Bmat @ x)
    _, _, vh = np.linalg.svd(C)
    null = vh[Nc:].conj().T  # (N2, N2-Nc) basis of nullspace
    np.testing.assert_allclose(null.conj().T @ grad,
                               np.zeros(N2 - Nc), atol=1e-8)


def test_L1():
    N = 20
    h = 0.5 * np.arange(-N // 2, N // 2)
    mu = identity(N)
    alpha = 1.0
    l1 = L1Regularizer(alpha, N)
    x = np.asarray(l1.solve(h, mu))
    for i in range(N):
        f = lambda z: alpha * np.abs(z) + 2 * h[i] * z + z ** 2
        res = minimize(f, 0.0, method="BFGS")
        assert np.abs(x[i] - res.x[0]) < 1e-5


def test_L1_rejects_nondiagonal_mu():
    l1 = L1Regularizer(1.0, 2)
    with pytest.raises(TypeError):
        l1.solve(np.zeros(2), asmatrixtype(np.eye(2) + 0.1))


def test_non_negative():
    h = np.array([0.0, -10.0, 10.0])
    N = h.size
    mu = identity(N)
    func = NonNegativePenalty(N)
    x = np.asarray(func.solve(h, mu))
    step_f = lambda z: z if z >= 0 else 0.0
    for i in range(N):
        f = lambda z: 1e5 * step_f(-z) + 2 * h[i] * z + z ** 2
        res = minimize(f, 0.0, method="BFGS")
        assert np.abs(x[i] - res.x[0]) < 1e-5


def test_L2():
    rng = np.random.RandomState(100)
    N, M = 10, 5
    sqrt_mu = _randn_cmplx(rng, N, N)
    mu = asmatrixtype(sqrt_mu.T.conj() @ sqrt_mu)
    alpha = 2.0
    A = _randn_cmplx(rng, M, N)
    h = _randn_cmplx(rng, N)
    l2 = L2Regularizer(alpha, A)
    x = np.asarray(l2.solve(h, mu))

    def f(x):
        return (alpha * np.linalg.norm(A @ x) ** 2 +
                2 * np.real(h.conj().T @ x) +
                np.real(x.conj().T @ (np.asarray(mu.asmatrix()) @ x)))

    x_ref = _minimize(f, x)
    np.testing.assert_allclose(x, x_ref, atol=np.abs(x_ref).max() * 1e-5,
                               rtol=0)


def test_semi_positive_definite_penalty():
    rng = np.random.RandomState(100)
    K, N = 20, 10
    h = _randn_cmplx(rng, N * N * K)
    for mu in [
        asmatrixtype(identity(N * N * K)),
        PartialDiagonalMatrix(ScaledIdentityMatrix(N * N, 1.0), (K,)),
    ]:
        p = SemiPositiveDefinitePenalty((N, N, K), axis=2)
        res = np.asarray(p.solve(h, mu))
        x = res.reshape((N, N, K))
        for k in range(K):
            evals, _ = np.linalg.eigh(x[:, :, k])
            assert all(evals > -1e-10)


def test_semi_positive_definite_hermitian_exact():
    """With Hermitian input slices the projection is the classic
    eigenvalue clamp — compare against a per-slice NumPy oracle."""
    rng = np.random.RandomState(7)
    K, N = 5, 6
    slices = rng.randn(K, N, N)
    slices = 0.5 * (slices + np.transpose(slices, (0, 2, 1)))
    x3 = np.moveaxis(slices, 0, 2)  # (N, N, K)
    mu = identity(N * N * K)
    # prox input h chosen so that -h/mu == x3
    h = -x3.ravel()
    p = SemiPositiveDefinitePenalty((N, N, K), axis=2)
    res = np.asarray(p.solve(h, mu)).reshape(N, N, K)
    for k in range(K):
        evals, evecs = np.linalg.eigh(slices[k])
        ref = (evecs * np.maximum(evals, 0)) @ evecs.T
        np.testing.assert_allclose(res[:, :, k], ref, atol=1e-10)


def test_objective_call_values():
    rng = np.random.RandomState(3)
    A = rng.randn(4, 3)
    y = rng.randn(4)
    x = rng.randn(3)
    ls = LeastSquares(2.0, A, y)
    assert np.isclose(ls(x), 2.0 * np.linalg.norm(y - A @ x) ** 2)
    l1 = L1Regularizer(0.5, 3)
    assert np.isclose(l1(x), 0.5 * np.abs(x).sum())
    l2 = L2Regularizer(3.0, A)
    assert np.isclose(l2(x), 3.0 * np.linalg.norm(A @ x) ** 2)
    assert NonNegativePenalty(3)(x) == 0.0
    assert SemiPositiveDefinitePenalty((1, 1, 3), 2)(x) == 0.0


def test_thin_spectral_solve_wide_A():
    """Wide A (M<N): the rank-M thin-spectral path must match the dense
    inverse oracle (alpha A^T A + c I)^{-1} v to near machine precision."""
    rng = np.random.RandomState(11)
    M, N = 12, 31
    A = rng.randn(M, N)
    y = rng.randn(M)
    alpha = 1.7
    ls = LeastSquares(alpha, A, y)
    thin = ls._get_eig_thin()
    assert thin is not False
    lam, U_r = thin
    assert U_r.shape == (N, M) and lam.shape == (M,)

    for c in (0.3, 1.0, 4.5):
        fac = ls.make_factors(ScaledIdentityMatrix(N, c))
        v = rng.randn(N)
        got = np.asarray(ls._apply_B(fac, jnp.asarray(v)))
        want = np.linalg.solve(alpha * A.T @ A + c * np.eye(N), v)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
        # matrix RHS branch (used by ConstrainedLeastSquares factoring)
        V = rng.randn(N, 3)
        gotm = np.asarray(ls._apply_B(fac, jnp.asarray(V)))
        wantm = np.linalg.solve(alpha * A.T @ A + c * np.eye(N), V)
        np.testing.assert_allclose(gotm, wantm, rtol=0, atol=1e-11)


def test_thin_spectral_complex_and_tall():
    rng = np.random.RandomState(5)
    # complex wide A
    M, N = 6, 15
    A = _randn_cmplx(rng, M, N)
    ls = LeastSquares(0.9, A, _randn_cmplx(rng, M))
    fac = ls.make_factors(ScaledIdentityMatrix(N, 2.0))
    v = _randn_cmplx(rng, N)
    got = np.asarray(ls._apply_B(fac, jnp.asarray(v)))
    want = np.linalg.solve(0.9 * A.conj().T @ A + 2.0 * np.eye(N), v)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
    # tall A: thin path unavailable, full path still exact
    At = rng.randn(N, M)
    ls2 = LeastSquares(1.0, At, rng.randn(N))
    assert ls2._get_eig_thin() is False
    fac2 = ls2.make_factors(ScaledIdentityMatrix(M, 0.7))
    v2 = rng.randn(M)
    got2 = np.asarray(ls2._apply_B(fac2, jnp.asarray(v2)))
    want2 = np.linalg.solve(At.T @ At + 0.7 * np.eye(M), v2)
    np.testing.assert_allclose(got2, want2, rtol=0, atol=1e-11)


def test_thin_spectral_zero_shift_falls_back():
    """A concrete zero shift cannot use the thin form (divides by c); the
    full-basis spectral solve must be used and stay finite for a
    full-column-rank Gram."""
    rng = np.random.RandomState(2)
    N = 8
    A = rng.randn(N + 4, N)  # tall: full rank, thin off anyway
    ls = LeastSquares(1.0, A, rng.randn(N + 4))
    fac = ls.make_factors(ScaledIdentityMatrix(N, 0.0))
    v = rng.randn(N)
    got = np.asarray(ls._apply_B(fac, jnp.asarray(v)))
    np.testing.assert_allclose(got, np.linalg.solve(A.T @ A, v), atol=1e-10)
    # wide A + explicit zero shift: must NOT take the thin branch (would
    # produce inf); full branch applies the (singular) pseudo-denominator
    Aw = rng.randn(4, N)
    lsw = LeastSquares(1.0, Aw, rng.randn(4))
    facw = lsw.make_factors(ScaledIdentityMatrix(N, 0.0))
    out = np.asarray(lsw._apply_B(facw, jnp.asarray(v)))
    # full branch with zero eigenvalues yields non-finite entries instead
    # of silently-wrong values (the reference's np.linalg.inv of a
    # singular matrix likewise degenerates, objectivefunc.py:94)
    assert out.shape == (N,)
