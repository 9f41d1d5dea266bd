"""Hardware validation + throughput of the fused SpM Pallas kernel.

Runs on the active backend (TPU under axon).  Three measurements at the
BASELINE config-#3 scale (nl=30, nw=201, B=4096, f32):

1. correctness: compiled fused kernel vs the XLA engine (BatchedSolver,
   f32) on the chip, short horizon — catches TPU-only precision hazards
   (BENCH_NOTES.md lesson 1: bf16 default matmuls);
2. fused throughput (fixed 500 iterations, chunked penalty schedule);
3. XLA engine f32 throughput on the same problem, same schedule.

Prints one JSON line per result.  ``--small`` shrinks everything for a
smoke run.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    small = "--small" in sys.argv
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu.models.applications import (spm_model,
                                                    synthetic_spm_data)
    from admmsolver_tpu.parallel import BatchedSolver, FusedSpMSolver

    B = 512 if small else 4096
    niter = 101 if small else 500
    s, g, prj_sum, prj_w, omega, rho = synthetic_spm_data(
        nl=30, nw=201, noise=1e-5)
    rng = np.random.RandomState(2)
    gs = (np.asarray(g)[None, :]
          + 1e-5 * rng.randn(B, g.size)).astype(np.float32)
    model = spm_model(s, np.asarray(g), prj_sum, prj_w, alpha_l1=1e-4)

    print(json.dumps({"backend": jax.default_backend(), "batch": B,
                      "niter": niter}), flush=True)

    fs = FusedSpMSolver(model, tile_b=256, interpret=False)
    bs = BatchedSolver(model, dtype=jnp.float32)
    ov = {(0, "y"): gs}

    # --- 1. correctness on hardware (short horizon, f32) --------------
    rf = fs.solve(ov, niter=21, mu0=0.1)
    rb = bs.solve(ov, niter=21, mu0=0.1, rtol=0.0,
                  record_residuals=False)
    errs = {f"x{k}_maxdiff": float(np.abs(
        np.asarray(rf.x[k], np.float64)
        - np.asarray(rb.x[k], np.float64)).max()) for k in range(3)}
    print(json.dumps({"check": "fused_vs_engine_short_horizon", **errs}),
          flush=True)
    assert max(errs.values()) < 5e-3, errs

    # --- 2/3. throughput ----------------------------------------------
    def timeit(solve):
        res = solve()  # compile + warm
        jax.block_until_ready(res.x)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve()
            jax.block_until_ready(res.x)
            times.append(time.perf_counter() - t0)
        return res, float(np.median(times))

    rf, dt_f = timeit(lambda: fs.solve(ov, niter=niter, mu0=0.1,
                                       rtol=0.0))
    print(json.dumps({
        "config": "spm_fused_pallas_f32", "batch": B, "niter": niter,
        "seconds": round(dt_f, 4),
        "instance_iters_per_s": round(B * niter / dt_f, 1),
        "min_rho": float(np.asarray(rf.x[2]).min()),
        "median_sum_rule_dev": float(np.median(np.abs(
            np.asarray(rf.x[0], np.float64) @ np.asarray(prj_sum)
            - 1.0)))}), flush=True)

    rb, dt_b = timeit(lambda: bs.solve(ov, niter=niter, mu0=0.1,
                                       rtol=0.0, record_residuals=False,
                                       chunked_checks=True))
    print(json.dumps({
        "config": "spm_engine_xla_f32", "batch": B, "niter": niter,
        "seconds": round(dt_b, 4),
        "instance_iters_per_s": round(B * niter / dt_b, 1),
        "fused_speedup": round(dt_b / dt_f, 2)}), flush=True)


if __name__ == "__main__":
    main()
