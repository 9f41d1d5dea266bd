"""Scenario-scheduler tests: a stream of problems larger than the batch
drains correctly with per-scenario results matching dedicated solves."""
import numpy as np
import pytest

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            SimpleOptimizer, identity)
from admmsolver_tpu.parallel import BatchedSolver, ScenarioScheduler


def _template(A, y):
    N = A.shape[1]
    return Model([LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
                 [(1, 0, identity(N), identity(N))])


def test_scheduler_drains_stream():
    rng = np.random.RandomState(0)
    M, N = 10, 24
    A = rng.randn(M, N)
    n_scen = 11
    ys = rng.randn(n_scen, M)

    bs = BatchedSolver(_template(A, ys[0]))
    sched = ScenarioScheduler(bs, batch_size=4, chunk_iters=100,
                              niter_max=3000, rtol=1e-8)
    results = sched.run({(0, "y"): ys[i]} for i in range(n_scen))

    assert len(results) == n_scen
    assert [r.scenario_id for r in results] == list(range(n_scen))
    assert all(r.converged for r in results)

    # each scenario's solution matches a dedicated single-instance solve
    # run with the same chunked schedule (repeated solve() restarts the
    # penalty counter, reference optimizer.py:310,319)
    for r in results[:4]:
        m = _template(A, ys[r.scenario_id])
        o = SimpleOptimizer(m)
        done = 0
        while done < 3000:
            o.solve(100, rtol=1e-8)
            done += 100
            if len(o._primal_residual) < done:
                break
        np.testing.assert_allclose(r.x[0], np.asarray(o.x[0]), atol=1e-6)


def test_scheduler_niter_budget():
    """Scenarios that never converge are harvested at the budget."""
    rng = np.random.RandomState(1)
    M, N = 8, 16
    A = rng.randn(M, N)
    ys = rng.randn(3, M)
    bs = BatchedSolver(_template(A, ys[0]))
    sched = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                              niter_max=100, rtol=0.0)  # rtol=0: no exit
    results = sched.run({(0, "y"): ys[i]} for i in range(3))
    assert len(results) == 3
    assert all(not r.converged for r in results)
    assert all(r.iterations == 100 for r in results)


def test_scheduler_empty_and_mismatched():
    rng = np.random.RandomState(2)
    A = rng.randn(6, 12)
    bs = BatchedSolver(_template(A, rng.randn(6)))
    sched = ScenarioScheduler(bs, batch_size=2, chunk_iters=10,
                              niter_max=20)
    assert sched.run(iter([])) == []
    with pytest.raises(AssertionError, match="keys"):
        sched.run(iter([{(0, "y"): rng.randn(6)},
                        {(1, "alpha"): 0.5}]))


def test_run_compiled_matches_host_loop():
    """The one-dispatch compiled drain (harvest/refill as device code)
    reproduces the host-driven wave loop scenario-for-scenario: same
    solutions, iteration counts, convergence flags, and final mu."""
    rng = np.random.RandomState(3)
    M, N = 10, 24
    A = rng.randn(M, N)
    n_scen = 11
    ys = rng.randn(n_scen, M)

    bs = BatchedSolver(_template(A, ys[0]))
    sched = ScenarioScheduler(bs, batch_size=4, chunk_iters=100,
                              niter_max=3000, rtol=1e-8)
    host = sched.run({(0, "y"): ys[i]} for i in range(n_scen))
    comp = sched.run_compiled({(0, "y"): ys[i]} for i in range(n_scen))
    assert len(comp) == n_scen
    for a, b in zip(host, comp):
        assert a.scenario_id == b.scenario_id
        assert a.iterations == b.iterations, (a.scenario_id,
                                              a.iterations, b.iterations)
        assert a.converged == b.converged
        np.testing.assert_array_equal(a.x[0], b.x[0])
        np.testing.assert_array_equal(a.final_mu, b.final_mu)


def test_run_compiled_budget_and_empty():
    rng = np.random.RandomState(4)
    M, N = 8, 16
    A = rng.randn(M, N)
    ys = rng.randn(5, M)
    bs = BatchedSolver(_template(A, ys[0]))
    sched = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                              niter_max=100, rtol=0.0)
    res = sched.run_compiled({(0, "y"): ys[i]} for i in range(5))
    assert len(res) == 5
    assert all(not r.converged for r in res)
    assert all(r.iterations == 100 for r in res)
    assert sched.run_compiled(iter([])) == []


def test_run_compiled_sharded_solver_falls_back():
    """A sharded solver routes run_compiled to the host loop (solve()
    owns device placement there; the compiled drain builds its state
    unsharded)."""
    from admmsolver_tpu.parallel import batch_sharding, make_mesh

    rng = np.random.RandomState(6)
    M, N = 8, 16
    A = rng.randn(M, N)
    ys = rng.randn(5, M)
    mesh = make_mesh(2)
    bs = BatchedSolver(_template(A, ys[0]),
                       sharding=batch_sharding(mesh))
    sched = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                              niter_max=100, rtol=0.0)
    res = sched.run_compiled({(0, "y"): ys[i]} for i in range(5))
    assert len(res) == 5
    assert all(r.iterations == 100 for r in res)


def test_run_compiled_f32_solver_casts_scenarios():
    """f64 scenario values must not promote an f32 compiled drain
    (round-5 review: run_compiled now applies solve()'s _cast_like)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    M, N = 8, 16
    A = rng.randn(M, N)
    ys = rng.randn(4, M)          # float64 scenario values
    bs = BatchedSolver(_template(A, ys[0]), dtype=jnp.float32)
    sched = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                              niter_max=100, rtol=0.0)
    comp = sched.run_compiled({(0, "y"): ys[i]} for i in range(4))
    host = sched.run({(0, "y"): ys[i]} for i in range(4))
    for a, b in zip(comp, host):
        assert a.x[0].dtype == np.float32
        np.testing.assert_array_equal(a.x[0], b.x[0])


def test_run_compiled_cache_keys_on_mu0():
    """Two schedulers sharing one solver with different mu0 must not
    reuse each other's compiled drain (round-5 review)."""
    rng = np.random.RandomState(8)
    M, N = 8, 16
    A = rng.randn(M, N)
    ys = rng.randn(3, M)
    bs = BatchedSolver(_template(A, ys[0]))
    scen = lambda: ({(0, "y"): ys[i]} for i in range(3))
    r1 = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                           niter_max=100, rtol=0.0,
                           mu0=1.0).run_compiled(scen())
    r10 = ScenarioScheduler(bs, batch_size=2, chunk_iters=50,
                            niter_max=100, rtol=0.0,
                            mu0=10.0).run_compiled(scen())
    # different penalty init -> different final mu
    assert not np.allclose(r1[0].final_mu, r10[0].final_mu)
