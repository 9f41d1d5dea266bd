"""Bisect the SDP f32-slower-than-f64 anomaly (sdp_profile.py finding).

Times the full engine on three model variants per dtype, and prints the
compiled cost analysis (XLA's own flop/byte estimates), so the offending
block is identified by measurement rather than guesswork:

  full   : LeastSquares + SemiPositiveDefinitePenalty   (the SDP model)
  nopsd  : LeastSquares + NonNegativePenalty            (PSD -> clip)
  nols   : L2Regularizer + SemiPositiveDefinitePenalty  (LS -> diagonal)

One JSON line per measurement.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _bench(bs, ov, niter, B, repeats=2):
    import jax

    kw = dict(niter=niter, rtol=0.0, record_residuals=False,
              chunked_checks=True, batch_size=B)
    out = bs.solve(ov, **kw)
    jax.block_until_ready(out.x)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = bs.solve(ov, **kw)
        jax.block_until_ready(out.x)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu import (L2Regularizer, LeastSquares, Model,
                                NonNegativePenalty,
                                SemiPositiveDefinitePenalty, identity)
    from admmsolver_tpu.parallel import BatchedSolver

    k, rest, B, niter = 8, 16, 256, 100
    shape = (k, k, rest)
    N = k * k * rest
    M = N // 2
    rng = np.random.RandomState(3)
    A = rng.randn(M, N)
    xt = np.zeros(shape)
    for r in range(rest):
        Q = rng.randn(k, k)
        xt[:, :, r] = Q @ Q.T / k
    y = A @ xt.reshape(-1)
    ys = y[None, :] + 1e-4 * rng.randn(B, M)

    def variant(name):
        ls = LeastSquares(1.0, A, y)
        if name == "full":
            fns = [ls, SemiPositiveDefinitePenalty(shape, 2)]
        elif name == "nopsd":
            fns = [ls, NonNegativePenalty(N)]
        elif name == "nols":
            fns = [L2Regularizer(1.0, identity(N)),
                   SemiPositiveDefinitePenalty(shape, 2)]
        return Model(fns, [(1, 0, identity(N), identity(N))])

    emit = lambda **kw: print(json.dumps(kw), flush=True)
    emit(backend=jax.default_backend(), B=B, N=N, M=M, niter=niter)

    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    for name in (only or ("full", "nopsd", "nols")):
        model = variant(name)
        for dtype in (jnp.float64, jnp.float32):
            bs = BatchedSolver(model, dtype=dtype)
            ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)} \
                if name != "nols" else None
            t = _bench(bs, ov, niter, B)
            emit(variant=name, dtype=dtype.__name__,
                 seconds=round(t, 4),
                 instance_iters_per_s=round(B * niter / t, 1),
                 ms_per_iter=round(1e3 * t / niter, 3))


if __name__ == "__main__":
    main()
