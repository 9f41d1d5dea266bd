"""In-graph amortized costs of the SDP iteration's two candidate hot ops.

Standalone per-call timings through the axon tunnel are dispatch-bound
(~20-40 ms RTT — BENCH_NOTES lesson 9 / sdp_profile.py), so this probe
chains each op ``reps`` times inside ONE jit via ``lax.fori_loop`` and
reports the marginal per-call cost:

  1. spectral_solve — the LS block's thin-spectral shifted solve
     (two (B,N)x(N,R) GEMMs + elementwise), the MXU cost center;
  2. psd_prox — the SPD block's projection (jacobi_eigh + VPU rebuild),
     the suspected layout-bound VPU cost center.

``python benches/sdp_op_probe.py [--cpu] [--small]``; one JSON line per
measurement.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _chain(step, x0, reps):
    """jit(fori_loop) of `step`, warmup + timed; returns seconds/rep."""
    import jax

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: step(v), x)

    out = run(x0)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / reps


def main():
    small = "--small" in sys.argv
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu import ScaledIdentityMatrix
    from admmsolver_tpu.models.applications import sdp_model
    from admmsolver_tpu.ops.prox import psd_project

    k, rest, B = 8, 16, (32 if small else 256)
    reps = 10 if small else 100
    shape = (k, k, rest)
    N = k * k * rest
    M = N // 2
    rng = np.random.RandomState(3)
    A = rng.randn(M, N)
    y = A @ rng.randn(N)
    model = sdp_model(A, y, shape, axis=2)
    f0 = model.functions[0]

    emit = lambda **kw: print(json.dumps(
        {k_: (round(v, 6) if isinstance(v, float) else v)
         for k_, v in kw.items()}), flush=True)
    emit(backend=jax.default_backend(), B=B, N=N, M=M, reps=reps)

    for dtype in (jnp.float64, jnp.float32):
        dn = dtype.__name__
        fac = f0.make_factors(ScaledIdentityMatrix(N, 1.0))
        v0 = jnp.asarray(rng.randn(B, N), dtype=dtype)

        # normalize each output so the chain can't blow up/denormalize
        def spec_step(v):
            out = jax.vmap(lambda vv: f0.prox_with_factors(fac, vv))(v)
            return out / jnp.linalg.norm(out) * float(np.sqrt(v0.size))

        t = _chain(spec_step, v0, reps)
        emit(op=f"spectral_solve_{dn}", ms_per_call=1e3 * t)

        def psd_step(v):
            out = jax.vmap(lambda vv: psd_project(vv, shape, 2))(v)
            # keep sign structure alive (projection of a projection is
            # idempotent; re-inject the original to keep work honest)
            return 0.5 * out + 0.5 * v0.astype(dtype)

        t = _chain(psd_step, v0, reps)
        emit(op=f"psd_prox_{dn}", ms_per_call=1e3 * t)


if __name__ == "__main__":
    main()
