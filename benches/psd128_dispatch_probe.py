"""Dispatch-matrix probe for the PSD prox at n = 128 (round 5): in-loop
ms/iter for {jacobi scan, XLA eigh} x {f32, f64} x batch {64, 256},
finiteness flagged — picks the JACOBI_MAX_N crossover with data instead
of extrapolating the n=32 lesson-15 table."""
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

    from admmsolver_tpu.ops import prox as prox_mod
    from admmsolver_tpu.ops.prox import psd_project

    n = 128
    iters = 5
    print(json.dumps({"backend": jax.default_backend(), "n": n}),
          flush=True)
    for K in (64, 256):
        rng = np.random.RandomState(1)
        x0 = rng.randn(K, n, n)
        x0 = (x0 + x0.transpose(0, 2, 1)) / 2
        d = rng.randn(K, n, n) * 0.1
        d = (d + d.transpose(0, 2, 1)) / 2
        for label, ceil in (("jacobi", 256), ("xla_eigh", 16)):
            for dt in (jnp.float32, jnp.float64):
                old = (prox_mod.JACOBI_MAX_N,
                       prox_mod.JACOBI_MAX_N_F32)
                prox_mod.JACOBI_MAX_N = ceil
                prox_mod.JACOBI_MAX_N_F32 = None
                try:
                    def body(i, x):
                        flat = x.reshape(K, n * n)
                        proj = jax.vmap(
                            lambda v: psd_project(v, (n, n, 1), 2))(flat)
                        return (proj.reshape(K, n, n)
                                + jnp.asarray(d, dt))

                    run = jax.jit(
                        lambda x: jax.lax.fori_loop(0, iters, body, x))
                    out = run(jnp.asarray(x0, dt))
                    jax.block_until_ready(out)
                    t0 = time.perf_counter()
                    out = run(jnp.asarray(x0, dt))
                    jax.block_until_ready(out)
                    el = time.perf_counter() - t0
                    print(json.dumps({
                        "K": K, "path": label,
                        "dtype": np.dtype(dt).name,
                        "ms_per_iter": round(el * 1e3 / iters, 1),
                        "ms_per_slice_iter": round(
                            el * 1e3 / iters / K, 3),
                        "finite": bool(np.isfinite(
                            np.asarray(out)).all())}), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "K": K, "path": label,
                        "dtype": np.dtype(dt).name,
                        "error": str(e)[:120]}), flush=True)
                finally:
                    (prox_mod.JACOBI_MAX_N,
                     prox_mod.JACOBI_MAX_N_F32) = old


if __name__ == "__main__":
    main()
