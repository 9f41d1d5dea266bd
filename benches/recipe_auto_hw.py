"""Hardware proof of the round-5 recipe auto-selection criterion
(round-4 VERDICT item 4): a user calling PLAIN ``BatchedSolver.solve``
on SDP k=32 f64 at a >= 200-iteration horizon gets the validated mixed
recipe's throughput without reading BENCH_NOTES.  Rows: solve() with
the default recipe="auto", recipe="plain" (forced single-phase f64),
and the explicit solve_mixed call — auto should match mixed."""
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

    from admmsolver_tpu.models.applications import sdp_model
    from admmsolver_tpu.parallel import BatchedSolver

    k, rest, B, niter = 32, 4, 64, 400
    shape = (k, k, rest)
    N = k * k * rest
    M = N // 2
    rng = np.random.RandomState(6)
    A = rng.randn(M, N)
    xt = np.zeros(shape)
    for r in range(rest):
        Q = rng.randn(k, k)
        xt[:, :, r] = Q @ Q.T / k
    y = A @ xt.reshape(-1)
    ys = y[None, :] + 1e-4 * rng.randn(B, M)
    ov = {(0, "y"): jnp.asarray(ys)}
    bs = BatchedSolver(sdp_model(A, y, shape, axis=2),
                       dtype=jnp.float64)

    def row(name, fn):
        res = fn()
        jax.block_until_ready(res.x)
        t0 = time.perf_counter()
        res = fn()
        jax.block_until_ready(res.x)
        dt = time.perf_counter() - t0
        X = np.asarray(res.x[1], np.float64).reshape(B, *shape)
        lam = np.linalg.eigvalsh(np.moveaxis(X, (1, 2), (-2, -1)))
        print(json.dumps({
            "row": name, "seconds": round(dt, 3),
            "instance_iters_per_s": round(B * niter / dt, 1),
            "min_eig": round(float(lam.min()), 9),
            "finite": bool(np.isfinite(X).all())}), flush=True)
        return res

    kw = dict(niter=niter, rtol=0.0, record_residuals=False)
    print(json.dumps({"backend": jax.default_backend(),
                      "config": f"sdp k={k} B={B} niter={niter} f64"}),
          flush=True)
    row("solve_plain", lambda: bs.solve(ov, recipe="plain", **kw))
    row("solve_auto_default", lambda: bs.solve(ov, **kw))
    row("solve_mixed_explicit", lambda: bs.solve_mixed(
        ov, niter_low=3 * niter // 4, niter=niter - 3 * niter // 4,
        rtol=0.0, low_rtol=0.0, record_residuals=False))


if __name__ == "__main__":
    main()
