"""Decompose the fused-SpM solve: Pallas chunk vs boundary-step cost.

The fused driver alternates 100-iteration VMEM-resident kernel chunks
with an XLA boundary step (per-lane affine factor refresh + pair
residuals + penalty balancing).  A naive one-call timing is useless
here: per-call dispatch through the axon tunnel costs ~25-30 ms, which
swamps every per-chunk quantity (the round-3 version of this probe
measured exactly that — factors_only, chunk_step and kernel_only all
"cost" ~25 ms, i.e. pure dispatch).  This version measures MARGINAL
costs by slope: each jitted program runs its unit k times in a
``lax.fori_loop`` with the state threaded through the carry (no CSE),
timed at k=1 and k=11, marginal = (t11 - t1) / 10.

  1. kernel-only chunk (100 iters)  — fused_spm_chunk, factors fixed
  2. full chunk step (100 iters)    — factors + kernel + residuals + mu
  3. factor refresh alone           — per-lane Schur/CLS algebra
  4. the compiled 500-iter solve, blocking on the result pytree

Prints one JSON line per measurement.  ``--small`` shrinks for a CPU
smoke run.  (Marginal values are per unit: (t11 - t1) / 10.)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed(fn, *args, repeats=5):
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
    zf = lambda f: jnp.zeros((f, B), jnp.float32)
    state0 = (zf(fs.nl_pad), zf(fs.nl_pad), zf(fs.nw_pad),
              zf(fs.nl_pad), zf(fs.nw_pad), mu,
              jnp.zeros(B, dtype=bool), jnp.zeros(B, jnp.int32))
    tols = (jnp.float32(0.0), jnp.float32(0.0))
    knobs = (jnp.float32(2.0), jnp.float32(10.0), jnp.float32(1e3))

    def marginal(make_loop, label):
        t1 = _timed(make_loop(1), state0)
        t11 = _timed(make_loop(11), state0)
        print(json.dumps({"probe": label,
                          "t1_ms": round(t1 * 1e3, 3),
                          "t11_ms": round(t11 * 1e3, 3),
                          "marginal_ms": round((t11 - t1) * 1e2, 3)}),
              flush=True)

    # 1. kernel-only chunk: factors fixed, state threaded (no CSE)
    Mf, b2f = jax.jit(lambda m, a, ac: fs._factors(m[:, 0], m[:, 1],
                                                   a, ac))(mu, alpha_ls,
                                                           acy)
    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(mu[:, 0]).at[1].set(mu[:, 1])
    scal = scal.at[2].set(0.5 * alpha1 / mu[:, 0])

    def kernel_loop(k):
        def run(state):
            def body(_, st):
                out = fused_spm_chunk(
                    fs.Pt, fs.P, Mf, b2f, scal, st[0], st[1], st[2],
                    st[3], st[4], n_iters=iters, tile_b=fs.tile_b,
                    interpret=fs.interpret)
                # out = advanced 5-tuple state + x0_prev; drop the extra
                return tuple(out[:5]) + st[5:]
            return jax.lax.fori_loop(0, k, body, state)
        return jax.jit(run)

    marginal(kernel_loop, f"kernel_chunk_{iters}it")

    # 2. full chunk step (factors + kernel + residuals + penalty)
    step = fs._chunk_step(iters)

    def step_loop(k):
        def run(state):
            def body(_, st):
                st, _ = step(st, acy, alpha_ls, alpha1, tols, knobs,
                             jnp.array(True))
                return st
            return jax.lax.fori_loop(0, k, body, state)
        return jax.jit(run)

    marginal(step_loop, f"chunk_step_{iters}it")

    # 3. factor refresh alone (mu perturbed per round so nothing folds)
    def factors_loop(k):
        def run(state):
            def body(i, carry):
                m, acc = carry
                Mf, b2f = fs._factors(m[:, 0], m[:, 1], alpha_ls, acy)
                return (m + 1e-7, acc + Mf[0, 0] + b2f[0, 0])
            m, acc = jax.lax.fori_loop(
                0, k, body, (state[5], jnp.float32(0.0)))
            return acc
        return jax.jit(run)

    marginal(factors_loop, "factors_only")

    # 4. full compiled solve, blocking on the result pytree (res.x)
    niter = 5 * iters
    ov = {(0, "y"): gs}
    r = fs.solve(ov, niter=niter, mu0=0.1, rtol=0.0)
    jax.block_until_ready(r.x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fs.solve(ov, niter=niter, mu0=0.1, rtol=0.0)
        jax.block_until_ready(r.x)
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(json.dumps({"probe": f"full_{niter}it", "ms": round(t * 1e3, 3),
                      "inst_iters_per_s": round(B * niter / t, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
