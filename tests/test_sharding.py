"""Mesh-sharded batch solves on the 8-virtual-device CPU mesh
(SURVEY.md §4: multi-device tests via XLA host-platform emulation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from admmsolver_tpu import L1Regularizer, LeastSquares, Model, identity
from admmsolver_tpu.parallel import (
    BatchedSolver,
    batch_sharding,
    make_mesh,
)


def _template(A, y, alpha=0.1):
    N = A.shape[1]
    return Model([LeastSquares(1.0, A, y), L1Regularizer(alpha, N)],
                 [(1, 0, identity(N), identity(N))])


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh()


def test_sharded_matches_unsharded(mesh):
    rng = np.random.RandomState(21)
    M, N = 10, 24
    B = 2 * len(mesh.devices.ravel())
    A = rng.randn(M, N)
    ys = rng.randn(B, M)

    t = _template(A, ys[0])
    plain = BatchedSolver(t).solve({(0, "y"): ys}, niter=150)
    sharded = BatchedSolver(t, sharding=batch_sharding(mesh)).solve(
        {(0, "y"): ys}, niter=150)

    np.testing.assert_allclose(np.asarray(sharded.x[0]),
                               np.asarray(plain.x[0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sharded.iterations),
                               np.asarray(plain.iterations))
    # outputs actually live sharded over the mesh
    assert sharded.x[0].sharding.num_devices == len(mesh.devices.ravel())


def test_sharded_global_convergence_agreement(mesh):
    """The loop exits only when ALL shards' lanes converge — the done
    reduction is global (the psum-equivalent consensus, SURVEY.md §5)."""
    rng = np.random.RandomState(22)
    M, N = 8, 12
    ndev = len(mesh.devices.ravel())
    B = ndev
    A = rng.randn(M, N)
    # one hard lane on the last device, easy lanes elsewhere (nonzero —
    # exactly-zero lanes never pass the reference's relative test)
    ys = np.tile(0.1 * (A @ np.ones(N)), (B, 1))
    ys[-1] = 50 * rng.randn(M)
    alphas = np.full(B, 1e-3)
    alphas[-1] = 10.0
    t = _template(A, ys[0])
    res = BatchedSolver(t, sharding=batch_sharding(mesh)).solve(
        {(0, "y"): ys, (1, "alpha"): alphas}, niter=3000, rtol=1e-8)
    its = np.asarray(res.iterations)
    assert its[0] != its[-1]  # lanes froze at different iterations


def test_uneven_batch_auto_padding(mesh):
    """A batch not divisible by the mesh is padded internally and the
    result trimmed back; lane values match the unsharded solve."""
    rng = np.random.RandomState(23)
    M, N = 6, 10
    ndev = len(mesh.devices.ravel())
    B = ndev + 1
    A = rng.randn(M, N)
    ys = rng.randn(B, M)
    t = _template(A, ys[0])
    res = BatchedSolver(t, sharding=batch_sharding(mesh)).solve(
        {(0, "y"): ys}, niter=50)
    assert res.x[0].shape == (B, N)
    plain = BatchedSolver(t).solve({(0, "y"): ys}, niter=50)
    np.testing.assert_allclose(np.asarray(res.x[0]),
                               np.asarray(plain.x[0]), atol=1e-10)


def test_sharded_solve_path_falls_back_to_loop(mesh):
    """A sharded solver's solve_path (fused defaults to the host loop
    under sharding — `solve` owns device placement) matches the
    unsharded path driver."""
    rng = np.random.RandomState(22)
    M, N = 8, 16
    nlam = 2 * len(mesh.devices.ravel())
    A = rng.randn(M, N)
    y = rng.randn(M)
    lams = np.logspace(0, -2, nlam)
    ys = np.broadcast_to(y, (nlam, M))
    t = _template(A, y)
    kw = dict(overrides={(0, "y"): ys}, group_size=nlam // 2,
              niter=100, rtol=1e-8)
    plain = BatchedSolver(t).solve_path((1, "alpha"), lams, **kw)
    sharded = BatchedSolver(t, sharding=batch_sharding(mesh)).solve_path(
        (1, "alpha"), lams, **kw)
    np.testing.assert_allclose(np.asarray(sharded.x[0]),
                               np.asarray(plain.x[0]), atol=1e-10)


def test_sharded_per_instance_operators():
    """Per-instance A batching composes with instance-axis sharding:
    every lane on an 8-device mesh matches its independent solve."""
    import numpy as np

    from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                SimpleOptimizer, identity)
    from admmsolver_tpu.parallel import (BatchedSolver, batch_sharding,
                                         make_mesh)

    rng = np.random.RandomState(3)
    M, N, B = 6, 10, 16
    As = rng.randn(B, M, N)
    ys = rng.randn(B, M)

    def mk(A, y):
        return Model(
            [LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
            [(1, 0, identity(N), identity(N))])

    bs = BatchedSolver(mk(As[0], ys[0]),
                       sharding=batch_sharding(make_mesh()))
    res = bs.solve({(0, "A"): As, (0, "y"): ys}, niter=60)
    for b in (0, 7, 15):
        o = SimpleOptimizer(mk(As[b], ys[b]))
        o.solve(60)
        np.testing.assert_allclose(np.asarray(res.x[0][b]),
                                   np.asarray(o.x[0]), atol=1e-9)
