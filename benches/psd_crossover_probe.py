"""Jacobi-vs-sign crossover probe for the PSD prox (round 5): in-loop
ms/iter at n in {32, 48, 64, 96}, K=256 slices, both dtypes.  Sets the
JACOBI_MAX_N dispatch boundary with data — the concern is lesson 6
(batched TINY f64 GEMMs lower to pathological emulated dot_generals),
which would make the sign path lose exactly where Jacobi wins."""
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

    iters, K = 5, 256
    print(json.dumps({"backend": jax.default_backend(), "K": K}),
          flush=True)
    for n in (32, 48, 64, 96):
        rng = np.random.RandomState(n)
        x0 = rng.randn(K, n, n)
        x0 = (x0 + x0.transpose(0, 2, 1)) / 2
        d = rng.randn(K, n, n) * 0.1
        d = (d + d.transpose(0, 2, 1)) / 2
        for label, ceil in (("jacobi", 256), ("sign", 8)):
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
                        "n": n, "path": label,
                        "dtype": np.dtype(dt).name,
                        "ms_per_iter": round(el * 1e3 / iters, 2),
                        "finite": bool(np.isfinite(
                            np.asarray(out)).all())}), flush=True)
                finally:
                    (prox_mod.JACOBI_MAX_N,
                     prox_mod.JACOBI_MAX_N_F32) = old


if __name__ == "__main__":
    main()
