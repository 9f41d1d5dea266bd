"""SDP workload profile: where does the iteration time go?

Times the three candidate bottlenecks of the SDP config (BASELINE #4)
in isolation on the active backend, in f64 and f32:

  1. the thin-spectral quadratic solve (two (B,N)x(N,R) GEMMs),
  2. the batched-eigh PSD projection ((B*rest, k, k) slices),
  3. the full engine iteration (chunked checks),

then measures the mixed-precision pipeline (f32 phase + f64 polish)
end-to-end against pure f64 at matched solution quality.  One JSON line
per measurement.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timeit(fn, *args, repeats=5):
    import jax

    # BatchResult is a plain dataclass, not a pytree: block on .x
    block = lambda o: jax.block_until_ready(
        o.x if hasattr(o, "x") else o)
    out = fn(*args)
    block(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        block(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    small = "--small" in sys.argv
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu.models.applications import sdp_model
    from admmsolver_tpu.ops.prox import psd_project
    from admmsolver_tpu.parallel import BatchedSolver

    k, rest, B = 8, 16, (64 if small else 256)
    niter = 50 if small else 100
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
    model = sdp_model(A, y, shape, axis=2)

    emit = lambda **kw: print(json.dumps(
        {k_: (round(v, 6) if isinstance(v, float) else v)
         for k_, v in kw.items()}), flush=True)
    emit(backend=jax.default_backend(), B=B, N=N, M=M, niter=niter)

    for dtype in (jnp.float64, jnp.float32):
        dn = dtype.__name__
        f0 = model.functions[0]
        fac = f0.make_factors(
            __import__("admmsolver_tpu").ScaledIdentityMatrix(N, 1.0))
        v = jnp.asarray(rng.randn(B, N), dtype=dtype)

        apply_B = jax.jit(jax.vmap(
            lambda vv: f0.prox_with_factors(fac, vv)))
        t = _timeit(apply_B, v)
        emit(op=f"spectral_solve_{dn}", ms_per_call=1e3 * t,
             est_ms_per_iter=1e3 * t)

        hb = jnp.asarray(rng.randn(B, N), dtype=dtype)
        mu = jnp.ones((B, N), dtype=dtype)
        prox = jax.jit(jax.vmap(
            lambda h_, m_: psd_project(-(h_ / m_), shape, 2)))
        t = _timeit(prox, hb, mu)
        emit(op=f"psd_eigh_prox_{dn}", ms_per_call=1e3 * t)

        bs = BatchedSolver(model, dtype=dtype)
        ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)}
        t = _timeit(lambda: bs.solve(ov, niter=niter, rtol=0.0,
                                     record_residuals=False,
                                     chunked_checks=True), repeats=2)
        emit(op=f"full_engine_{dn}", seconds=t,
             instance_iters_per_s=round(B * niter / t, 1),
             ms_per_iter=1e3 * t / niter)

    # mixed pipeline at matched quality
    bs64 = BatchedSolver(model, dtype=jnp.float64)
    ov = {(0, "y"): jnp.asarray(ys)}
    total = 4 * niter

    def fit_err(res):
        xr = np.asarray(res.x[0], np.float64)
        return float(np.median(np.abs(xr @ A.T - ys)))

    def lam_min(res):
        X = np.asarray(res.x[1], np.float64).reshape(B, k, k, rest)
        if not np.isfinite(X).all():
            # eigvalsh raises on NaN/Inf; surface the real diagnosis
            return float("nan")
        return float(np.linalg.eigvalsh(
            np.moveaxis(X, (1, 2), (-2, -1))).min())

    t64 = _timeit(lambda: bs64.solve(ov, niter=total, rtol=0.0,
                                     record_residuals=False,
                                     chunked_checks=True), repeats=2)
    r64 = bs64.solve(ov, niter=total, rtol=0.0, record_residuals=False,
                     chunked_checks=True)
    emit(op="pure_f64", iters=total, seconds=t64,
         instance_iters_per_s=round(B * total / t64, 1),
         fit_err=fit_err(r64), lam_min=lam_min(r64))

    def mixed():
        return bs64.solve_mixed(ov, niter_low=3 * niter, niter=niter,
                                rtol=0.0, record_residuals=False,
                                chunked_checks=True, low_rtol=0.0)

    tm = _timeit(mixed, repeats=2)
    rm = mixed()
    emit(op="mixed_f32_then_f64", iters=total, seconds=tm,
         instance_iters_per_s=round(B * total / tm, 1),
         fit_err=fit_err(rm), lam_min=lam_min(rm),
         speedup_vs_f64=round(t64 / tm, 2))


if __name__ == "__main__":
    main()
