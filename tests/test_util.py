"""Stencil-helper tests (reference ``/root/reference/test/test_util.py``)."""
import numpy as np

from admmsolver_tpu.utils import second_deriv_prj, smooth_regularizer_coeff, norm


def test_second_deriv_prj():
    """f(x) = x^2 has constant second derivative 2 on any mesh."""
    xmax = 3
    N = 1000
    x = np.linspace(0, np.sqrt(xmax), N) ** 2  # non-uniform mesh
    prj = second_deriv_prj(x)
    ypp = prj @ (x ** 2)
    np.testing.assert_allclose(ypp, np.full(N - 2, 2.0))


def test_smooth_regularizer_coeff():
    omega_min, omega_max = 0.0, 3.0
    N = 10000
    omega = np.linspace(np.sqrt(omega_min), np.sqrt(omega_max), N) ** 2
    prj = smooth_regularizer_coeff(omega)
    ypp = 2
    assert np.abs(np.linalg.norm(prj @ omega ** 2) ** 2 -
                  (omega_max - omega_min) * ypp ** 2) < 1e-2


def test_norm():
    assert np.isclose(norm(np.array([3.0, 4.0])), 5.0)


def test_trace_writes_profile(tmp_path):
    """utils.telemetry.trace produces an xprof trace directory with
    events (the SURVEY §5 tracing hook; named scopes in optimizer.py
    label the phases)."""
    import jax.numpy as jnp

    from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                SimpleOptimizer, identity)
    from admmsolver_tpu.utils.telemetry import trace

    rng = np.random.RandomState(0)
    A = rng.randn(6, 12)
    m = Model([LeastSquares(1.0, A, rng.randn(6)),
               L1Regularizer(0.1, 12)],
              [(1, 0, identity(12), identity(12))])
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        o = SimpleOptimizer(m)
        o.solve(5, rtol=0)
    import glob
    files = glob.glob(logdir + "/**/*", recursive=True)
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
               or "xplane" in f for f in files), files


def test_timed_solve_emits_throughput():
    from admmsolver_tpu import L1Regularizer, LeastSquares, Model, identity
    from admmsolver_tpu.parallel import BatchedSolver
    from admmsolver_tpu.utils.telemetry import timed_solve

    rng = np.random.RandomState(1)
    A = rng.randn(6, 12)
    ys = rng.randn(4, 6)
    bs = BatchedSolver(Model(
        [LeastSquares(1.0, A, ys[0]), L1Regularizer(0.1, 12)],
        [(1, 0, identity(12), identity(12))]))
    rec = timed_solve(lambda: bs.solve({(0, "y"): ys}, niter=10, rtol=0,
                                       record_residuals=False))
    assert rec["iterations_total"] == 40
    assert rec["instance_iters_per_s"] > 0
    assert rec["seconds"] > 0


def test_banded_stencils_match_dense():
    """second_deriv_banded / smooth_regularizer_banded are value-
    identical to the dense reference stencils (util.py:4-39) with O(N)
    storage."""
    from admmsolver_tpu.utils import (second_deriv_banded,
                                      second_deriv_prj,
                                      smooth_regularizer_banded,
                                      smooth_regularizer_coeff)

    x = np.cumsum(0.1 + np.random.RandomState(0).rand(40))
    np.testing.assert_allclose(
        np.asarray(second_deriv_banded(x).asmatrix()),
        second_deriv_prj(x), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(smooth_regularizer_banded(x).asmatrix()),
        smooth_regularizer_coeff(x), atol=1e-13)
    # the Gram stays banded (pentadiagonal), never dense
    P = smooth_regularizer_banded(x)
    G = P.gram()
    from admmsolver_tpu.ops.linop import BandedMatrix

    assert isinstance(G, BandedMatrix)
    assert G.offsets == (-2, -1, 0, 1, 2)
    Pd = smooth_regularizer_coeff(x)
    np.testing.assert_allclose(np.asarray(G.asmatrix()), Pd.T @ Pd,
                               atol=1e-12)
