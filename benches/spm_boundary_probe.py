"""Decompose the fused-SpM solve: Pallas chunk vs boundary-step cost.

The fused driver alternates 100-iteration VMEM-resident kernel chunks
with an XLA boundary step (per-lane affine factor refresh + pair
residuals + penalty balancing).  The round-2 kernel-only probe measured
~40 us marginal per chunk, yet the full 500-iteration solve runs at
36.3M inst-iters/s (~56 ms) — if the boundary dominates, it is the next
speed-of-light target.  This probe times, at the BASELINE SpM scale
(nl=30, nw=201, B=4096, f32):

  1. `_factors` alone (jitted)     — per-lane Schur inverse + CLS algebra
  2. one full `_chunk_step(100)`   — factors + kernel + residuals + mu
  3. kernel-only chunk (100 iters) — fused_spm_chunk with fixed factors
  4. the full compiled 500-iter run for reference

Prints one JSON line per measurement.  ``--small`` shrinks for a CPU
smoke run.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _med(fn, *args, repeats=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    small = "--small" in sys.argv
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admmsolver_tpu.models.applications import (spm_model,
                                                    synthetic_spm_data)
    from admmsolver_tpu.ops.kernels import fused_spm_chunk
    from admmsolver_tpu.parallel import FusedSpMSolver

    B = 64 if small else 4096
    nl, nw = (12, 25) if small else (30, 201)
    iters = 10 if small else 100
    s, g, prj_sum, prj_w, omega, rho = synthetic_spm_data(nl=nl, nw=nw,
                                                          noise=1e-5)
    rng = np.random.RandomState(2)
    gs = (np.asarray(g)[None, :]
          + 1e-5 * rng.randn(B, g.size)).astype(np.float32)
    model = spm_model(s, np.asarray(g), prj_sum, prj_w, alpha_l1=1e-4)
    fs = FusedSpMSolver(model, tile_b=min(256, B))

    acy = jnp.asarray(gs @ np.asarray(fs.Ac).T)
    alpha_ls = jnp.full((B,), 1.0, jnp.float32)
    alpha1 = jnp.full((B,), 1e-4, jnp.float32)
    mu = jnp.full((B, 2), 0.1, jnp.float32)

    # 1. factors alone
    fac = jax.jit(lambda m, a, ac: fs._factors(m[:, 0], m[:, 1], a, ac))
    t = _med(fac, mu, alpha_ls, acy)
    print(json.dumps({"probe": "factors_only", "ms": round(t * 1e3, 3)}),
          flush=True)

    # 2. one full chunk step (factors + kernel + residuals + penalty)
    step = fs._chunk_step(iters)
    zf = lambda f: jnp.zeros((f, B), jnp.float32)
    state = (zf(fs.nl_pad), zf(fs.nl_pad), zf(fs.nw_pad),
             zf(fs.nl_pad), zf(fs.nw_pad), mu,
             jnp.zeros(B, dtype=bool), jnp.zeros(B, jnp.int32))
    tols = (jnp.float32(0.0), jnp.float32(0.0))
    knobs = (jnp.float32(2.0), jnp.float32(10.0), jnp.float32(1e3))
    jstep = jax.jit(lambda st: step(st, acy, alpha_ls, alpha1, tols,
                                    knobs, jnp.array(True)))
    t = _med(jstep, state)
    print(json.dumps({"probe": f"chunk_step_{iters}it",
                      "ms": round(t * 1e3, 3)}), flush=True)

    # 3. kernel-only chunk with precomputed factors
    Mf, b2f = jax.jit(lambda m, a, ac: fs._factors(m[:, 0], m[:, 1],
                                                   a, ac))(mu, alpha_ls,
                                                           acy)
    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(mu[:, 0]).at[1].set(mu[:, 1])
    scal = scal.at[2].set(0.5 * alpha1 / mu[:, 0])
    kern = jax.jit(lambda st: fused_spm_chunk(
        fs.Pt, fs.P, Mf, b2f, scal, st[0], st[1], st[2], st[3], st[4],
        n_iters=iters, tile_b=fs.tile_b, interpret=fs.interpret))
    t = _med(kern, state)
    print(json.dumps({"probe": f"kernel_only_{iters}it",
                      "ms": round(t * 1e3, 3)}), flush=True)

    # 4. full run for reference
    niter = 5 * iters
    ov = {(0, "y"): gs}
    r = fs.solve(ov, niter=niter, mu0=0.1, rtol=0.0)
    t = _med(lambda: fs.solve(ov, niter=niter, mu0=0.1, rtol=0.0))
    print(json.dumps({"probe": f"full_{niter}it", "ms": round(t * 1e3, 3),
                      "inst_iters_per_s": round(B * niter / t, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
