"""Per-workload benchmarks: the five BASELINE.json configs on the active
backend (TPU under axon; CPU otherwise).

Prints one JSON line per config: batched instance-iterations/s, plus a
workload-specific correctness figure so a throughput number can never
hide a broken solve.  ``python benches/bench_workloads.py [config ...]``
with configs from {bp, lasso, spm, sdp, lpath}; default all.

The headline driver benchmark stays ``bench.py`` (basis pursuit only).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time_solve(solve, repeats=2):
    import jax
    res = solve()  # compile + warmup (identical call)
    jax.block_until_ready(res.x)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = solve()
        jax.block_until_ready(res.x)
        times.append(time.perf_counter() - t0)
    return res, float(np.median(times))


def _emit(name, B, niter, dt, extra):
    print(json.dumps({
        "config": name,
        "batch": B,
        "niter": niter,
        "seconds": round(dt, 4),
        "instance_iters_per_s": round(B * niter / dt, 1),
        **extra,
    }), flush=True)


def bench_bp(dtype):
    """Config 1: basis pursuit, dense A 256x512, two-block."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import basis_pursuit_model
    from admmsolver_tpu.parallel import BatchedSolver

    M, N, B, niter = 256, 512, 1024, 200
    rng = np.random.RandomState(0)
    A = rng.randn(M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 20, replace=False)] = rng.randn(20)
    ys = xt @ A.T
    bs = BatchedSolver(basis_pursuit_model(A, ys[0]), dtype=dtype)
    ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)}
    res, dt = _time_solve(lambda: bs.solve(
        ov, niter=niter, rtol=0.0, record_residuals=False))
    err = float(np.max(np.abs(np.asarray(res.x[0], np.float64) - xt)))
    _emit("basis_pursuit", B, niter, dt,
          {"max_err_vs_truth": round(err, 6)})


def bench_lasso(dtype):
    """Config 2: nonnegative elastic-net, three-block with adaptive mu."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import lasso_model
    from admmsolver_tpu.parallel import BatchedSolver

    M, N, B, niter = 256, 512, 512, 200
    rng = np.random.RandomState(1)
    A = rng.randn(M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 20, replace=False)] = np.abs(rng.randn(20))
    ys = xt @ A.T
    model = lasso_model(A, ys[0], alpha_l1=0.05, nonneg=True)
    bs = BatchedSolver(model, dtype=dtype)
    ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)}
    res, dt = _time_solve(lambda: bs.solve(
        ov, niter=niter, rtol=0.0, record_residuals=False))
    xs = np.asarray(res.x[2], np.float64)
    _emit("lasso_nonneg_3block", B, niter, dt,
          {"min_x_nonneg_block": round(float(xs.min()), 9)})


def bench_spm(dtype):
    """Config 3: SpM analytic continuation, batched per-frequency data
    (three-block: ConstrainedLS sum rule + L1 + nonneg via projector)."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import (spm_model,
                                                    synthetic_spm_data)
    from admmsolver_tpu.parallel import BatchedSolver

    B, niter = 4096, 500
    s, g, prj_sum, prj_w, omega, rho = synthetic_spm_data(
        nl=30, nw=201, noise=1e-5)
    rng = np.random.RandomState(2)
    gs = np.asarray(g)[None, :] + 1e-5 * rng.randn(B, g.size)
    model = spm_model(s, np.asarray(g), prj_sum, prj_w, alpha_l1=1e-4)
    bs = BatchedSolver(model, dtype=dtype)
    ov = {(0, "y"): jnp.asarray(gs, dtype=dtype)}
    res, dt = _time_solve(lambda: bs.solve(
        ov, mu0=0.1, niter=niter, rtol=0.0, record_residuals=False))
    rho_out = np.asarray(res.x[2], np.float64)
    sums = rho_out @ np.ones(rho_out.shape[1])
    _emit("spm_per_frequency", B, niter, dt,
          {"min_rho": round(float(rho_out.min()), 9),
           "median_sum_rule_dev": round(
               float(np.median(np.abs(
                   np.asarray(res.x[0], np.float64) @ np.asarray(prj_sum)
                   - 1.0))), 9)})


def bench_sdp(dtype):
    """Config 4: semidefinite-constrained quadratic — batched eigh prox."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import sdp_model
    from admmsolver_tpu.parallel import BatchedSolver

    k, rest, B, niter = 8, 16, 256, 100
    shape = (k, k, rest)
    N = k * k * rest
    M = N // 2
    rng = np.random.RandomState(3)
    A = rng.randn(M, N)
    # PSD ground truth per slice
    xt = np.zeros(shape)
    for r in range(rest):
        Q = rng.randn(k, k)
        xt[:, :, r] = Q @ Q.T / k
    y = A @ xt.reshape(-1)
    ys = y[None, :] + 1e-4 * rng.randn(B, M)
    model = sdp_model(A, y, shape, axis=2)
    bs = BatchedSolver(model, dtype=dtype)
    ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)}
    res, dt = _time_solve(lambda: bs.solve(
        ov, niter=niter, rtol=0.0, record_residuals=False))
    X = np.asarray(res.x[1], np.float64).reshape(B, k, k, rest)
    lam_min = np.linalg.eigvalsh(
        np.moveaxis(X, (1, 2), (-2, -1))).min()
    _emit("sdp_psd_prox", B, niter, dt,
          {"min_eigenvalue_psd_block": round(float(lam_min), 9)})


def bench_lpath(dtype):
    """Config 5: warm-started lambda-path sweep, 1024 values."""
    import jax.numpy as jnp
    from admmsolver_tpu.models.applications import basis_pursuit_model
    from admmsolver_tpu.parallel import BatchedSolver

    M, N, nlam, niter = 256, 512, 1024, 100
    rng = np.random.RandomState(4)
    A = rng.randn(M, N)
    xt = np.zeros(N)
    xt[rng.choice(N, 20, replace=False)] = rng.randn(20)
    y = A @ xt
    lams = np.logspace(0, -3, nlam)
    bs = BatchedSolver(basis_pursuit_model(A, y), dtype=dtype)
    res, dt = _time_solve(lambda: bs.solve_path(
        (1, "alpha"), lams, group_size=256, niter=niter, rtol=0.0,
        record_residuals=False), repeats=1)
    err = float(np.max(np.abs(np.asarray(res.x[0][-1], np.float64) - xt)))
    _emit("lambda_path_1024", nlam, niter, dt,
          {"max_err_at_smallest_lambda": round(err, 6)})


def main():
    import jax
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv[1:]:
        # sitecustomize pins JAX_PLATFORMS=axon; env vars don't override
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    backend = jax.default_backend()
    dtype = jnp.float64
    names = args or ["bp", "lasso", "spm", "sdp", "lpath"]
    print(json.dumps({"backend": backend, "dtype": str(dtype.__name__)}),
          flush=True)
    table = {"bp": bench_bp, "lasso": bench_lasso, "spm": bench_spm,
             "sdp": bench_sdp, "lpath": bench_lpath}
    for n in names:
        table[n](dtype)


if __name__ == "__main__":
    main()
