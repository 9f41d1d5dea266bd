"""Hardware run of the solve_scan amortized driver: B=256 instances of
n=512 DISTINCT-A basis pursuit in one call (round-5 VERDICT item 7 —
the regime solve() rejects to protect HBM, and the reference handles
only as 256 separate SimpleOptimizer runs, optimizer.py:121-152)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu import L1Regularizer, LeastSquares, Model, identity
    from admmsolver_tpu.parallel import BatchedSolver

    M, N, B, niter = 128, 512, 256, 200
    rng = np.random.RandomState(42)
    As = rng.randn(B, M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 10, replace=False)] = rng.randn(10)
    ys = np.einsum("bmn,bn->bm", As, xt)
    m = Model([LeastSquares(1.0, As[0], ys[0]), L1Regularizer(0.1, N)],
              [(1, 0, identity(N), identity(N))])
    bs = BatchedSolver(m, dtype=jnp.float64)
    ov = {(0, "A"): jnp.asarray(As), (0, "y"): jnp.asarray(ys)}
    kw = dict(group_size=16, niter=niter, rtol=0.0,
              record_residuals=False)
    res = bs.solve_scan(ov, **kw)   # compile + warmup
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = bs.solve_scan(ov, **kw)
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    X = np.asarray(res.x[0], np.float64)
    fit = np.linalg.norm(np.einsum("bmn,bn->bm", As, X) - ys, axis=1) \
        / np.linalg.norm(ys, axis=1)
    err = np.abs(X - xt).max(axis=1) / np.abs(xt).max(axis=1)
    print(json.dumps({
        "config": "solve_scan distinct-A basis pursuit",
        "batch": B, "n": N, "m": M, "niter": niter,
        "group_size": 16, "seconds": round(dt, 2),
        "instance_iters_per_s": round(B * niter / dt, 1),
        "finite": bool(np.isfinite(X).all()),
        "median_rel_fit_residual": float(f"{np.median(fit):.3e}"),
        "median_rel_err_vs_truth": float(f"{np.median(err):.3e}"),
    }), flush=True)


if __name__ == "__main__":
    main()
