"""Hardware bench: COMPLEX SpM analytic continuation via the real
embedding (the supported TPU path for the reference's complex128-first
workloads, ``/root/reference/src/admmsolver/optimizer.py:146-152``).

The model is the flagship SpM 3-block with genuinely complex data ``g``
(Matsubara-like), realified with :func:`admmsolver_tpu.realify_model`:
block sizes double, real structured operators stay structured
(A ⊗ I₂), and the trajectory is exactly the complex trajectory
(tests/test_realify.py).  Runs on the active backend; prints one JSON
line with instance-iters/s and correctness figures (sum rule on the
decoded complex solution; solution match vs a CPU complex oracle lane).
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

    from admmsolver_tpu import realify_model
    from admmsolver_tpu.models.applications import (spm_model,
                                                    synthetic_spm_data)
    from admmsolver_tpu.models.realify import encode
    from admmsolver_tpu.parallel import BatchedSolver

    B = 256 if small else 2048
    niter = 100 if small else 500
    s, g, prj_sum, prj_w, omega, rho = synthetic_spm_data(
        nl=30, nw=201, noise=1e-5)
    rng = np.random.RandomState(7)
    # genuinely complex data: Matsubara-like phase noise
    gs = (np.asarray(g)[None, :]
          + 1e-5 * (rng.randn(B, g.size) + 1j * rng.randn(B, g.size)))
    model = spm_model(s, gs[0], prj_sum, prj_w, alpha_l1=1e-4)
    re = realify_model(model)

    bs = BatchedSolver(re.model)  # f64 real embedding
    ys = np.stack([np.asarray(encode(y)) for y in gs])
    ov = {(0, "y"): jnp.asarray(ys)}

    def solve():
        return bs.solve(ov, mu0=0.1, niter=niter, rtol=0.0,
                        record_residuals=False)

    res = solve()  # compile + warm
    jax.block_until_ready(res.x)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve()
        jax.block_until_ready(res.x)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    rho_l = re.decode_x(res.x)[0]          # complex (B, nl)
    sums = np.abs(np.asarray(rho_l) @ np.asarray(prj_sum) - 1.0)

    # oracle: lane 0 solved complex128 by the REFERENCE (NumPy, host)
    # must match the decoded realified lane — true complex parity on
    # the exact benchmarked problem.
    sys.path.insert(0, "/root/reference/src")
    try:
        import admmsolver.matrix as rmat
        import admmsolver.objectivefunc as robj
        import admmsolver.optimizer as ropt
    finally:
        sys.path.remove("/root/reference/src")
    nl, nw = s.size, prj_w.shape[0]
    rp = ropt.Model(
        [robj.ConstrainedLeastSquares(
            1.0, rmat.DiagonalMatrix(-np.asarray(s)), gs[0],
            np.asarray(prj_sum).reshape(1, nl), np.array([1.0])),
         robj.L1Regularizer(1e-4, nl), robj.NonNegativePenalty(nw)],
        [(0, 1, rmat.identity(nl), rmat.identity(nl)),
         (0, 2, rmat.DenseMatrix(np.asarray(prj_w)),
          rmat.identity(nw))])
    ro = ropt.SimpleOptimizer(rp, mu=0.1)
    ro.solve(niter, rtol=0.0)
    lane_err = float(np.abs(np.asarray(rho_l[0]) - ro.x[0]).max())

    print(json.dumps({
        "config": "complex_spm_realified_f64",
        "backend": jax.default_backend(),
        "batch": B, "niter": niter, "seconds": round(dt, 4),
        "instance_iters_per_s": round(B * niter / dt, 1),
        "median_sum_rule_dev": float(np.median(sums)),
        "lane0_vs_cpu_complex_oracle_max_err": lane_err,
    }), flush=True)
    assert lane_err < 1e-8, lane_err


if __name__ == "__main__":
    main()
