"""Per-iteration cost of the over-relaxation path (round 5): fixed-200-
iteration basis-pursuit throughput at B=4096 f64, relax=1.0 vs 1.8.
Isolates the sweep-cost delta from the iteration-count win."""
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

    M, N, B, niter = 256, 512, 4096, 200
    rng = np.random.RandomState(0)
    A = rng.randn(M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 20, replace=False)] = rng.randn(20)
    ys = xt @ A.T
    bs = BatchedSolver(Model(
        [LeastSquares(1.0, A, ys[0]), L1Regularizer(0.1, N)],
        [(1, 0, identity(N), identity(N))]), dtype=jnp.float64)
    ov = {(0, "y"): jnp.asarray(ys)}
    out = {}
    for r in (1.0, 1.8):
        kw = dict(niter=niter, rtol=0.0, record_residuals=False, relax=r)
        res = bs.solve(ov, **kw)
        jax.block_until_ready(res.x)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = bs.solve(ov, **kw)
            jax.block_until_ready(res.x)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out[f"relax_{r}"] = round(B * niter / dt, 1)
    out["relax_cost_ratio"] = round(out["relax_1.0"] / out["relax_1.8"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
