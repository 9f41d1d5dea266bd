"""Checkpoint/resume and telemetry tests (SURVEY.md §5 subsystems)."""
import numpy as np
import pytest

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            SimpleOptimizer, identity)
from admmsolver_tpu.parallel import BatchedSolver
from admmsolver_tpu.utils import (check_finite_state, convergence_report,
                                  load_batch_result, restore_optimizer,
                                  save_batch_result, save_state)


def _model(A, y, alpha=0.1):
    N = A.shape[1]
    return Model([LeastSquares(1.0, A, y), L1Regularizer(alpha, N)],
                 [(1, 0, identity(N), identity(N))])


def test_checkpoint_roundtrip_resume(tmp_path):
    """Interrupt at 50 iterations, checkpoint, restore, continue — must
    match the same split run without the save/load round trip exactly.
    (A split run legitimately differs from an unsplit one: each solve()
    call restarts the penalty-update counter, like the reference's
    repeated solve() calls, optimizer.py:310,319.)"""
    rng = np.random.RandomState(0)
    M, N = 10, 25
    A = rng.randn(M, N)
    y = rng.randn(M)

    witness = SimpleOptimizer(_model(A, y))
    witness.solve(50)
    witness.solve(50)

    part = SimpleOptimizer(_model(A, y))
    part.solve(50)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, part)

    resumed = restore_optimizer(path, _model(A, y))
    assert len(resumed._primal_residual) == len(part._primal_residual)
    resumed.solve(50)

    np.testing.assert_allclose(np.asarray(resumed.x[0]),
                               np.asarray(witness.x[0]), atol=1e-14)
    np.testing.assert_allclose(resumed._primal_residual,
                               witness._primal_residual, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed.mu),
                               np.asarray(witness.mu), rtol=0)


def test_checkpoint_structure_mismatch(tmp_path):
    rng = np.random.RandomState(1)
    A = rng.randn(5, 8)
    y = rng.randn(5)
    opt = SimpleOptimizer(_model(A, y))
    opt.solve(5)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, opt)

    A2 = rng.randn(5, 9)
    with pytest.raises(Exception):
        restore_optimizer(path, _model(A2, rng.randn(5)))


def test_batch_result_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    A = rng.randn(6, 12)
    ys = rng.randn(3, 6)
    bs = BatchedSolver(_model(A, ys[0]))
    res = bs.solve({(0, "y"): ys}, niter=30)
    path = str(tmp_path / "batch.npz")
    save_batch_result(path, res)
    res2 = load_batch_result(path)
    np.testing.assert_allclose(np.asarray(res2.x[0]),
                               np.asarray(res.x[0]))
    np.testing.assert_allclose(np.asarray(res2.mu), np.asarray(res.mu))
    # warm-restart a batched solve from the loaded state
    res3 = bs.solve({(0, "y"): ys}, x0=res2.x, mu0=res2.mu, niter=30)
    assert np.asarray(res3.iterations).max() <= 30


def test_convergence_report():
    primal = list(np.logspace(0, -8, 100))
    dual = list(np.logspace(0, -7, 100))
    rep = convergence_report(primal, dual)
    assert rep["iterations"] == 100
    assert rep["finite"] and not rep["stalled"]
    assert rep["reduction_rate"] < 0

    stalled = convergence_report([1.0] * 60, [1.0] * 60)
    assert stalled["stalled"]


def test_check_finite_state():
    rng = np.random.RandomState(3)
    A = rng.randn(4, 6)
    opt = SimpleOptimizer(_model(A, rng.randn(4)))
    opt.solve(5)
    check_finite_state(opt)  # healthy
    opt._x = (np.full(6, np.nan),) + tuple(opt._x[1:])
    with pytest.raises(FloatingPointError):
        check_finite_state(opt)


def test_solve_resumable(tmp_path):
    """Segmented checkpointed solve == one uninterrupted segmented solve:
    killing between segments and restarting from the file reproduces the
    same state; iteration counts accumulate across segments."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import basis_pursuit_model
    from admmsolver_tpu.parallel import BatchedSolver

    rng = np.random.RandomState(0)
    A = rng.randn(16, 32)
    xt = np.zeros((4, 32))
    for b in range(4):
        xt[b, rng.choice(32, 3, replace=False)] = rng.randn(3)
    ys = xt @ A.T
    ov = {(0, "y"): jnp.asarray(ys)}
    ckpt = str(tmp_path / "run.npz")

    bs = BatchedSolver(basis_pursuit_model(A, ys[0], alpha_l1=0.05))
    kw = dict(checkpoint_every=100, niter=300, rtol=0.0,
              record_residuals=False)

    # interrupted run: 1 segment, then "crash", then resume to completion
    r1 = bs.solve_resumable(ckpt, ov, **{**kw, "niter": 100})
    assert np.asarray(r1.iterations).max() == 100
    r2 = bs.solve_resumable(ckpt, ov, **kw)
    assert np.asarray(r2.iterations).max() == 300

    # uninterrupted segmented run for comparison
    ckpt2 = str(tmp_path / "run2.npz")
    bs2 = BatchedSolver(basis_pursuit_model(A, ys[0], alpha_l1=0.05))
    r3 = bs2.solve_resumable(ckpt2, ov, **kw)
    for a, b in zip(r2.x, r3.x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0)

    # a fully-covered checkpoint short-circuits (returns persisted state)
    r4 = bs.solve_resumable(ckpt, ov, **kw)
    for a, b in zip(r4.x, r2.x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scattered_checkpoint_roundtrip(tmp_path):
    """Per-process shard checkpoints (save_batch_result_local) reassemble
    to the full result — exercised on a sharded 8-virtual-device batch
    (single process: all lanes addressable, same mechanics)."""
    import jax

    from admmsolver_tpu.parallel import batch_sharding, make_mesh
    from admmsolver_tpu.utils.checkpoint import (
        load_batch_result_scattered, save_batch_result_local)

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    rng = np.random.RandomState(17)
    M, N = 8, 16
    B = 2 * len(jax.devices())
    A = rng.randn(M, N)
    ys = rng.randn(B, M)
    bs = BatchedSolver(_model(A, ys[0]),
                       sharding=batch_sharding(make_mesh()))
    res = bs.solve({(0, "y"): ys}, niter=40, rtol=0,
                   record_residuals=False)

    p = tmp_path / "ckpt_p0.npz"
    save_batch_result_local(str(p), res)
    back = load_batch_result_scattered([str(p)])
    for a, b in zip(res.x, back.x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(res.mu), np.asarray(back.mu))
    np.testing.assert_array_equal(np.asarray(res.iterations),
                                  np.asarray(back.iterations))

    # simulate two processes by splitting lanes across two shard files
    import jax.numpy as jnp

    from admmsolver_tpu.parallel.batch import BatchResult
    half = B // 2
    take = lambda sl: BatchResult(
        x=tuple(np.asarray(a)[sl] for a in res.x),
        h=tuple(np.asarray(a)[sl] for a in res.h),
        mu=np.asarray(res.mu)[sl],
        iterations=np.asarray(res.iterations)[sl],
        converged=np.asarray(res.converged)[sl],
        primal_residual=np.asarray(res.primal_residual)[sl],
        dual_residual=np.asarray(res.dual_residual)[sl])
    pa, pb = tmp_path / "p0.npz", tmp_path / "p1.npz"
    save_batch_result_local(str(pa), take(slice(0, half)))
    save_batch_result_local(str(pb), take(slice(half, B)))
    # second file's lanes are globally [half, B): patch its indices
    import json as _json
    with np.load(pb, allow_pickle=False) as z:
        arrs = {k: z[k] for k in z.files}
    arrs["lane_index"] = np.arange(half, B)
    np.savez(pb, **arrs)
    both = load_batch_result_scattered([str(pb), str(pa)])  # any order
    np.testing.assert_array_equal(np.asarray(both.x[0]),
                                  np.asarray(res.x[0]))
    np.testing.assert_array_equal(np.asarray(both.iterations),
                                  np.asarray(res.iterations))
