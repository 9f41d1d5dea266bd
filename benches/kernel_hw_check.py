"""Fused Pallas kernel hardware validation + throughput.

BENCH_NOTES.md lesson 1: CPU interpret mode does NOT reproduce TPU matmul
numerics, so the kernel must be validated on hardware.  This script runs
the compiled kernel on the active TPU against the XLA engine oracle —
strict short horizon, then long-horizon fixed-point agreement and
recovery of the planted signal (the same criteria as
tests/test_kernels.py) — and reports kernel-vs-engine f32 throughput.
Prints one JSON line.
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

    from admmsolver_tpu.models.applications import basis_pursuit_model
    from admmsolver_tpu.parallel import BatchedSolver
    from admmsolver_tpu.parallel.fused import FusedTwoBlockSolver

    assert jax.default_backend() == "tpu", (
        "hardware check needs the TPU backend (axon)")

    # the bench.py config (recoverable at alpha=0.1 within ~400 iters)
    M, N, B, niter = 256, 512, 1024, 401
    rng = np.random.RandomState(0)
    A = rng.randn(M, N)
    xt = np.zeros((B, N))
    for b in range(B):
        xt[b, rng.choice(N, 20, replace=False)] = rng.randn(20)
    ys = xt @ A.T
    model = basis_pursuit_model(A, ys[0])

    fs = FusedTwoBlockSolver(model, tile_b=128)  # compiled (not interpret)
    assert not fs.interpret and fs.thin
    bs = BatchedSolver(model, dtype=jnp.float32)
    ov_np = {(0, "y"): np.asarray(ys, np.float32)}
    ov = {k: jnp.asarray(v) for k, v in ov_np.items()}

    # strict short horizon vs the engine
    rf = fs.solve(ov_np, niter=21)
    rb = bs.solve(ov, niter=21, record_residuals=False)
    d21 = float(np.abs(np.asarray(rf.x0) - np.asarray(rb.x[0])).max())

    # long horizon: kernel and engine land in the same f32 fixed-point
    # neighborhood and both recover the planted signal
    rf = fs.solve(ov_np, niter=niter, rtol=0.0)  # warmup (compile)
    t0 = time.perf_counter()
    rf = fs.solve(ov_np, niter=niter, rtol=0.0)
    jax.block_until_ready(rf.x0)
    dt_k = time.perf_counter() - t0

    kw = dict(niter=niter, rtol=0.0, record_residuals=False)
    rb = bs.solve(ov, **kw)
    jax.block_until_ready(rb.x)
    t0 = time.perf_counter()
    rb = bs.solve(ov, **kw)
    jax.block_until_ready(rb.x)
    dt_e = time.perf_counter() - t0

    d_fp = float(np.abs(np.asarray(rf.x0) - np.asarray(rb.x[0])).max())
    err_k = float(np.abs(np.asarray(rf.x0) - xt).max())
    err_e = float(np.abs(np.asarray(rb.x[0]) - xt).max())

    ok = (d21 < 1e-3 and d_fp < 2e-2
          and err_k <= max(2.0 * err_e, 1e-2 * np.abs(xt).max()))
    print(json.dumps({
        "check": "fused kernel on TPU hardware (thin-spectral, f32)",
        "short_horizon_max_dev_vs_engine": round(d21, 8),
        "fixed_point_max_dev_vs_engine": round(d_fp, 6),
        "recovery_err_kernel": round(err_k, 6),
        "recovery_err_engine_f32": round(err_e, 6),
        "kernel_inst_iters_per_s": round(B * niter / dt_k, 1),
        "engine_f32_inst_iters_per_s": round(B * niter / dt_e, 1),
        "pass": bool(ok),
    }))
    assert ok


if __name__ == "__main__":
    main()
