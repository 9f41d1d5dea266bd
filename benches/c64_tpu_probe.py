"""Probe: does a native complex64 solve graph compile + run on this TPU?

CLAUDE.md records a >40-min axon remote-compile hang for a complex64
solve graph (round 1); the backend guard (`backend.guard_complex`)
therefore blocks complex state on TPU and points users at the realify
embedding.  This probe re-tests the capability cheaply so the guard can
be lifted if the toolchain has moved: a tiny 2-block complex basis
pursuit (M=8, N=16, B=4, 30 iterations) is compiled WITH A TIMEOUT
enforced by the caller (`timeout <s> python benches/c64_tpu_probe.py`).

Prints one JSON line: {"ok": true, max_err, seconds} on success; if the
compile hangs, the caller's timeout kills it and the guard stays.

Probe result (2026-08-21, axon/v5e): fails fast — materializing a
complex64 device constant raises ``UNIMPLEMENTED: TPU backend error``
before any solve runs.  Native complex is unsupported on this backend at
the runtime level (not merely a slow compile); the ``guard_complex``
check and the realify embedding remain the supported complex path.
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
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                                identity)
    from admmsolver_tpu.parallel import BatchedSolver

    rng = np.random.RandomState(0)
    M, N, B = 8, 16, 4
    A = (rng.randn(M, N) + 1j * rng.randn(M, N)).astype(np.complex64)
    xt = np.zeros((B, N), np.complex64)
    for b in range(B):
        sel = rng.choice(N, 3, replace=False)
        xt[b, sel] = rng.randn(3) + 1j * rng.randn(3)
    ys = xt @ A.T

    model = Model([LeastSquares(1.0, A, ys[0]), L1Regularizer(0.01, N)],
                  [(1, 0, identity(N), identity(N))])
    t0 = time.time()
    # bypass the TPU complex guard deliberately: this probe exists to
    # test whether the guard is still needed
    bs = BatchedSolver.__new__(BatchedSolver)
    from admmsolver_tpu.optimizer import ADMMPlan

    bs.model = model
    bs.plan = ADMMPlan(model)
    bs.dtype = jnp.dtype(jnp.complex64)
    bs.sharding = None
    bs._compiled_cache = {}
    res = bs.solve({(0, "y"): ys}, niter=30, rtol=0.0,
                   record_residuals=False)
    x = np.asarray(res.x[0])
    err = float(np.max(np.abs(x - xt)))
    print(json.dumps({"ok": bool(np.isfinite(err)), "backend":
                      jax.default_backend(), "max_err_vs_truth":
                      round(err, 6), "seconds": round(time.time() - t0,
                                                      2)}), flush=True)


if __name__ == "__main__":
    main()
