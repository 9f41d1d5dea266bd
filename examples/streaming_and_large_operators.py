"""Round-5 drivers: large per-instance operators and compiled streaming.

Two regimes beyond the plain batched solve:

1. ``solve_scan`` — a batch of LARGE heterogeneous problems (different
   dense A per instance, n > 128) where per-lane factor state would
   blow the HBM budget: a ``lax.map`` over instance groups reuses one
   compiled group solve, one dispatch total.  The reference covers this
   only as one ``SimpleOptimizer`` per problem
   (``optimizer.py:121-152``).
2. ``ScenarioScheduler.run_compiled`` — continuous batching over an
   oversubscribed stream of problems with ragged convergence, with
   harvest/refill of device lanes compiled INTO the solve loop (one
   dispatch for the whole stream).
"""
import os

import numpy as np

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            identity)
from admmsolver_tpu.parallel import BatchedSolver, ScenarioScheduler


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    rng = np.random.RandomState(12)

    # --- 1. solve_scan: distinct large operators ----------------------
    M, N, B = (16, 40, 3) if small else (64, 256, 16)
    niter = 60 if small else 400
    As = rng.randn(B, M, N) / np.sqrt(M)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 4, replace=False)] = rng.randn(4)
    ys = np.einsum("bmn,bn->bm", As, xt)
    bs = BatchedSolver(Model(
        [LeastSquares(1.0, As[0], ys[0]), L1Regularizer(0.02, N)],
        [(1, 0, identity(N), identity(N))]))
    res = bs.solve_scan({(0, "A"): As, (0, "y"): ys},
                        group_size=max(1, B // 4), niter=niter)
    fit = np.linalg.norm(
        np.einsum("bmn,bn->bm", As, np.asarray(res.x[0])) - ys,
        axis=1) / np.linalg.norm(ys, axis=1)
    print(f"solve_scan x{B} (distinct A, one dispatch): "
          f"median rel fit residual {np.median(fit):.2e}")

    # --- 2. compiled continuous batching ------------------------------
    S = 6 if small else 48
    lanes = 2 if small else 8
    A = rng.randn(M, N) / np.sqrt(M)
    stream_y = []
    for i in range(S):
        x = np.zeros(N)
        x[rng.choice(N, 2 + i % 5, replace=False)] = rng.randn(2 + i % 5)
        stream_y.append(A @ x)
    bs2 = BatchedSolver(Model(
        [LeastSquares(1.0, A, stream_y[0]), L1Regularizer(0.02, N)],
        [(1, 0, identity(N), identity(N))]))
    sched = ScenarioScheduler(bs2, batch_size=lanes, chunk_iters=50,
                              niter_max=2000, rtol=1e-8)
    results = sched.run_compiled({(0, "y"): y} for y in stream_y)
    conv = sum(r.converged for r in results)
    iters = np.array([r.iterations for r in results])
    print(f"compiled stream: {S} scenarios over {lanes} lanes, "
          f"{conv}/{S} converged, iterations p5/p50/p95 = "
          f"{int(np.percentile(iters, 5))}/{int(np.median(iters))}/"
          f"{int(np.percentile(iters, 95))}")


if __name__ == "__main__":
    main()
