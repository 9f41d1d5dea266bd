"""Hardware row for continuous batching (round-4 VERDICT weakness #4):
a 4x-oversubscribed SpM stream with RAGGED convergence (per-scenario
alpha/noise spread) drained three ways on the TPU:

  1. static batches  — S/B full-batch solves; every batch waits for its
     slowest lane (the utilization loss continuous batching removes)
  2. host wave loop  — ScenarioScheduler.run (per-wave dispatch cost)
  3. compiled stream — ScenarioScheduler.run_compiled (ONE dispatch,
     harvest/refill as device code)

Emits one JSON line per mode with wall time, effective scenario
throughput, and utilization (useful instance-iterations / lane-slots
spent)."""
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

    from admmsolver_tpu.models.applications import (spm_model,
                                                    synthetic_spm_data)
    from admmsolver_tpu.parallel import BatchedSolver, ScenarioScheduler

    B, S, chunk, niter_max = 256, 1024, 100, 4000
    rtol = 1e-8
    s, g, prj_sum, prj_w, omega, rho = synthetic_spm_data(
        nl=30, nw=201, noise=1e-5)
    rng = np.random.RandomState(5)
    # ragged stream: noise and alpha spread over decades -> iteration
    # counts spread correspondingly
    noise = 10.0 ** rng.uniform(-6, -3.5, S)
    alphas = 10.0 ** rng.uniform(-4.5, -3, S)
    gs = np.asarray(g)[None, :] + noise[:, None] * rng.randn(S, g.size)
    model = spm_model(s, np.asarray(g), prj_sum, prj_w, alpha_l1=1e-4)
    bs = BatchedSolver(model, dtype=jnp.float64)

    print(json.dumps({"backend": jax.default_backend(), "B": B, "S": S,
                      "chunk": chunk, "rtol": rtol}), flush=True)

    # --- 1. static batches -------------------------------------------
    def run_static():
        iters = np.zeros(S, np.int64)
        conv = np.zeros(S, bool)
        waves = 0
        for g0 in range(0, S, B):
            ov = {(0, "y"): jnp.asarray(gs[g0:g0 + B]),
                  (1, "alpha"): jnp.asarray(alphas[g0:g0 + B])}
            r = bs.solve(ov, mu0=0.1, niter=niter_max, rtol=rtol,
                         record_residuals=False)
            iters[g0:g0 + B] = np.asarray(r.iterations)
            conv[g0:g0 + B] = np.asarray(r.converged)
            # lane-slots spent = B * slowest lane of the batch
            waves += int(np.asarray(r.iterations).max())
        return iters, conv, waves * B

    # warmup (compile) then measure
    run_static()
    t0 = time.perf_counter()
    it_s, cv_s, slots_s = run_static()
    dt_static = time.perf_counter() - t0
    print(json.dumps({
        "mode": "static_batches", "seconds": round(dt_static, 2),
        "scenarios_per_s": round(S / dt_static, 2),
        "converged": int(cv_s.sum()),
        "useful_iters": int(it_s.sum()),
        "utilization": round(it_s.sum() / slots_s, 3),
        "median_iters": int(np.median(it_s)),
        "p95_iters": int(np.percentile(it_s, 95))}), flush=True)

    scen = [{(0, "y"): gs[i], (1, "alpha"): np.float64(alphas[i])}
            for i in range(S)]

    # scheduler needs (1,'alpha') as (B,) per-lane values; pass scalars
    sched = ScenarioScheduler(bs, batch_size=B, chunk_iters=chunk,
                              niter_max=niter_max, rtol=rtol, mu0=0.1)

    # --- 2. host wave loop -------------------------------------------
    sched.run(iter(scen))  # warmup/compile
    t0 = time.perf_counter()
    res_h = sched.run(iter(scen))
    dt_host = time.perf_counter() - t0
    it_h = np.asarray([r.iterations for r in res_h])
    print(json.dumps({
        "mode": "host_wave_loop", "seconds": round(dt_host, 2),
        "scenarios_per_s": round(S / dt_host, 2),
        "converged": sum(r.converged for r in res_h),
        "useful_iters": int(it_h.sum())}), flush=True)

    # --- 3. compiled stream ------------------------------------------
    sched.run_compiled(iter(scen))  # warmup/compile
    t0 = time.perf_counter()
    res_c = sched.run_compiled(iter(scen))
    dt_comp = time.perf_counter() - t0
    it_c = np.asarray([r.iterations for r in res_c])
    # lane-slots spent: every wave costs B*chunk slots; infer wave count
    # from the max per-lane accumulation is not visible here, so report
    # useful iters and throughput (the comparable utilization number is
    # the static row's)
    print(json.dumps({
        "mode": "compiled_stream", "seconds": round(dt_comp, 2),
        "scenarios_per_s": round(S / dt_comp, 2),
        "converged": sum(r.converged for r in res_c),
        "useful_iters": int(it_c.sum()),
        "speedup_vs_static": round(dt_static / dt_comp, 2),
        "speedup_vs_host_loop": round(dt_host / dt_comp, 2)}),
        flush=True)


if __name__ == "__main__":
    main()
