"""Hardware row for continuous batching (round-4 VERDICT weakness #4):
a 4x-oversubscribed basis-pursuit stream with RAGGED convergence
(sparsity and alpha spread over decades; measured p5~1000 vs p95~5800
iterations to 1e-9) drained three ways on the TPU:

  1. static batches  — S/B full-batch solves; every batch waits for its
     slowest lane (the utilization loss continuous batching removes)
  2. host wave loop  — ScenarioScheduler.run (per-wave dispatch cost,
     ~30-40 ms each through the axon tunnel)
  3. compiled stream — ScenarioScheduler.run_compiled (ONE dispatch,
     harvest/refill as device code)

Emits one JSON line per mode with wall time, effective scenario
throughput, and (for static) utilization = useful instance-iterations /
lane-slots spent."""
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
    from admmsolver_tpu.parallel import BatchedSolver, ScenarioScheduler

    M, N = 256, 512
    B, S, chunk, niter_max = 256, 1024, 100, 6000
    atol = 1e-9
    rng = np.random.RandomState(5)
    A = rng.randn(M, N)
    K = rng.randint(8, 120, S)      # sparsity spread -> difficulty
    xt = np.zeros((S, N))
    for i in range(S):
        xt[i, rng.choice(N, K[i], replace=False)] = rng.randn(K[i])
    ys = xt @ A.T
    alphas = 10.0 ** rng.uniform(-2.5, -0.5, S)
    model = Model([LeastSquares(1.0, A, ys[0]), L1Regularizer(0.1, N)],
                  [(1, 0, identity(N), identity(N))])
    bs = BatchedSolver(model, dtype=jnp.float64)

    print(json.dumps({"backend": jax.default_backend(), "B": B, "S": S,
                      "chunk": chunk, "atol": atol}), flush=True)

    # --- 1. static batches -------------------------------------------
    def run_static():
        iters = np.zeros(S, np.int64)
        conv = np.zeros(S, bool)
        slots = 0
        for g0 in range(0, S, B):
            ov = {(0, "y"): jnp.asarray(ys[g0:g0 + B]),
                  (1, "alpha"): jnp.asarray(alphas[g0:g0 + B])}
            r = bs.solve(ov, niter=niter_max, rtol=0.0, atol=atol,
                         record_residuals=False)
            iters[g0:g0 + B] = np.asarray(r.iterations)
            conv[g0:g0 + B] = np.asarray(r.converged)
            slots += int(np.asarray(r.iterations).max()) * B
        return iters, conv, slots

    run_static()  # compile + warm
    t0 = time.perf_counter()
    it_s, cv_s, slots_s = run_static()
    dt_static = time.perf_counter() - t0
    print(json.dumps({
        "mode": "static_batches", "seconds": round(dt_static, 2),
        "scenarios_per_s": round(S / dt_static, 2),
        "converged": int(cv_s.sum()),
        "useful_iters": int(it_s.sum()),
        "utilization": round(it_s.sum() / slots_s, 3),
        "p5_iters": int(np.percentile(it_s, 5)),
        "median_iters": int(np.median(it_s)),
        "p95_iters": int(np.percentile(it_s, 95))}), flush=True)

    scen = [{(0, "y"): ys[i], (1, "alpha"): np.float64(alphas[i])}
            for i in range(S)]
    sched = ScenarioScheduler(bs, batch_size=B, chunk_iters=chunk,
                              niter_max=niter_max, rtol=0.0, atol=atol)

    # --- 2. host wave loop -------------------------------------------
    sched.run(iter(scen))  # compile + warm
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
    sched.run_compiled(iter(scen))  # compile + warm
    t0 = time.perf_counter()
    res_c = sched.run_compiled(iter(scen))
    dt_comp = time.perf_counter() - t0
    it_c = np.asarray([r.iterations for r in res_c])
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
