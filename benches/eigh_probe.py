"""Scan-amortized probe: what does the batched small eigh (the SDP PSD
prox, ops/prox.py) actually cost per call on this backend, free of the
per-dispatch tunnel latency (~30-40 ms, BENCH_NOTES lesson 9)?

Chains ``inner`` dependent eigh+reconstruct calls inside one jit and
reports the marginal cost per call.  One JSON line per measurement.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    Bk, k = 4096, 8
    inner = 50
    rng = np.random.RandomState(0)
    A0 = rng.randn(Bk, k, k)

    def psd_step(A):
        # symmetrize-from-lower like the prox, then eigh + clamp + rebuild
        sym = jnp.tril(A) + jnp.swapaxes(jnp.tril(A, -1), -1, -2)
        w, v = jnp.linalg.eigh(sym)
        wp = jnp.maximum(w, 0.0)
        X = jnp.einsum("...ij,...j,...kj->...ik", v, wp, v)
        return X + 1e-3  # keep the chain non-idempotent

    def chain(A):
        return lax.fori_loop(0, inner, lambda i, a: psd_step(a), A)

    emit = lambda **kw: print(json.dumps(kw), flush=True)
    emit(backend=jax.default_backend(), batch=Bk, k=k, inner=inner)

    # flat (Bk, k, k) batch vs the engine's vmapped 4-D (B, rest, k, k)
    # batch — XLA's TPU eigh may not flatten extra batch dims.
    for dtype in (jnp.float64, jnp.float32):
        for shp, tag in (((Bk, k, k), "flat"),
                         ((Bk // 16, 16, k, k), "4d")):
            A = jnp.asarray(A0.reshape(shp), dtype=dtype)
            f = jax.jit(chain)
            out = f(A)
            jax.block_until_ready(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(A))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            emit(op=f"eigh_psd_chain_{tag}_{dtype.__name__}",
                 ms_per_call=round(1e3 * dt / inner, 4),
                 total_s=round(dt, 4))


if __name__ == "__main__":
    main()
