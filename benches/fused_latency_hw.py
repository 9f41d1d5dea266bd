"""FusedTwoBlockSolver verdict run (round-4 VERDICT weakness #3).

The VMEM-resident fused kernel lost to the XLA engine 2.6x in the
throughput regime (B=1024, MXU-bound — BENCH_NOTES lesson 2).  Its
remaining hypothesis is the LATENCY-bound regime: small batches and
short horizons where per-iteration launch overheads, not FLOPs,
dominate.  This run measures per-call latency for B in {32, 128} and
niter in {100, 500} at N=512 f32, fused vs engine, same convergence
semantics (rtol=0 fixed-iteration), and prints one JSON line per cell
plus a verdict line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from admmsolver_tpu import L1Regularizer, LeastSquares, Model, identity
    from admmsolver_tpu.parallel import BatchedSolver, FusedTwoBlockSolver

    M, N = 256, 512
    rng = np.random.RandomState(11)
    A = rng.randn(M, N)
    xt = np.zeros((256, N))
    for b in range(256):
        xt[b, rng.choice(N, 20, replace=False)] = rng.randn(20)
    ys_all = (xt @ A.T).astype(np.float32)

    model = Model([LeastSquares(1.0, A, ys_all[0]), L1Regularizer(0.1, N)],
                  [(1, 0, identity(N), identity(N))])
    engine = BatchedSolver(model, dtype=jnp.float32)
    fused = FusedTwoBlockSolver(model, tile_b=32)

    print(json.dumps({"backend": jax.default_backend(),
                      "problem": f"bp {M}x{N} f32"}), flush=True)

    def timeit(fn, reps=7):
        fn()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            jax.block_until_ready(
                r.x if hasattr(r, "x") else (r.x0, r.x1))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rows = []
    for B in (32, 128):
        ys = jnp.asarray(ys_all[:B])
        for niter in (100, 500):
            tf = timeit(lambda: fused.solve(
                {(0, "y"): ys}, niter=niter, rtol=0.0))
            te = timeit(lambda: engine.solve(
                {(0, "y"): ys}, niter=niter, rtol=0.0,
                record_residuals=False))
            rows.append((B, niter, tf, te))
            print(json.dumps({
                "B": B, "niter": niter,
                "fused_ms": round(tf * 1e3, 2),
                "engine_ms": round(te * 1e3, 2),
                "fused_speedup": round(te / tf, 2)}), flush=True)

    wins = sum(1 for *_x, tf, te in rows if tf < te)
    print(json.dumps({
        "verdict": ("fused wins the latency regime"
                    if wins >= 3 else
                    "engine wins everywhere measured"),
        "fused_wins": wins, "cells": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
