"""Hardware validation of the round-5 Jacobi envelope extension
(n = 96..256): standalone reconstruction in both dtypes, plus an
in-loop (fori_loop under jit, vmapped shape) prox smoke — the regime
where XLA's eigh degrades/NaNs (BENCH_NOTES lessons 11/15)."""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

jax.config.update("jax_enable_x64", True)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    from admmsolver_tpu.ops.linop import jacobi_eigh
    from admmsolver_tpu.ops.prox import psd_project

    for n in (96, 128, 256):
        for dt in (jnp.float32, jnp.float64):
            rng = np.random.RandomState(n)
            K = 16 if n <= 128 else 4
            a = rng.randn(K, n, n)
            a = (a + a.transpose(0, 2, 1)) / 2
            f = jax.jit(lambda m: jacobi_eigh(m))
            w, v = f(jnp.asarray(a, dt))
            jax.block_until_ready(w)
            t0 = time.perf_counter()
            w, v = f(jnp.asarray(a, dt))
            jax.block_until_ready(w)
            dt_s = time.perf_counter() - t0
            V = np.asarray(v, np.float64)
            rec = np.einsum("kij,kj,klj->kil", V, np.asarray(w, np.float64), V)
            err = float(np.abs(rec - a).max())
            print(json.dumps({
                "probe": "standalone", "n": n, "dtype": np.dtype(dt).name,
                "K": K, "ms": round(dt_s * 1e3, 2),
                "recon_err": float(f"{err:.3e}"),
                "finite": bool(np.isfinite(np.asarray(w)).all()
                               and np.isfinite(V).all())}), flush=True)

    # in-loop: repeated PSD projection with a perturbation, the solver-
    # loop shape (fori_loop inside one jit over a batch axis)
    n, K = 128, 8
    rng = np.random.RandomState(1)
    x0 = rng.randn(K, n, n)
    x0 = (x0 + x0.transpose(0, 2, 1)) / 2
    d = rng.randn(K, n, n) * 0.1
    d = (d + d.transpose(0, 2, 1)) / 2
    for dt in (jnp.float32, jnp.float64):
        def body(i, x):
            flat = x.reshape(K, n * n)
            proj = jax.vmap(lambda v: psd_project(v, (n, n, 1), 2))(flat)
            return proj.reshape(K, n, n) + jnp.asarray(d, dt)

        run = jax.jit(lambda x: jax.lax.fori_loop(0, 5, body, x))
        out = run(jnp.asarray(x0, dt))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(jnp.asarray(x0, dt))
        jax.block_until_ready(out)
        el = time.perf_counter() - t0
        print(json.dumps({
            "probe": "in_loop_prox", "n": n, "dtype": np.dtype(dt).name,
            "iters": 5, "ms_per_iter": round(el * 1e3 / 5, 2),
            "finite": bool(np.isfinite(np.asarray(out)).all())}),
            flush=True)


if __name__ == "__main__":
    main()
