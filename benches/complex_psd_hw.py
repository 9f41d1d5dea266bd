"""Hardware validation of the unbounded complex-Hermitian PSD
projection (round 5): complex slices realify to 2n x 2n real and
project via the polynomial matrix-sign path — all-real GEMMs, so it
runs on the complex-free axon backend at ANY size.  Checks n = 96
(realified 192) against the LAPACK construction on host."""
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

    from admmsolver_tpu.ops.prox import _psd_project_herm

    n, K = 96, 8
    rng = np.random.RandomState(3)
    H = rng.randn(K, n, n) + 1j * rng.randn(K, n, n)
    H = (H + H.conj().transpose(0, 2, 1)) / 2
    # complex input cannot go to the device (no complex support);
    # feed the realified parts and embed on device like psd_project does
    X, Y = H.real, H.imag

    @jax.jit
    def project(X, Y):
        top = jnp.concatenate([X, -Y], axis=-1)
        bot = jnp.concatenate([Y, X], axis=-1)
        R = jnp.concatenate([top, bot], axis=-2)
        Rp = _psd_project_herm(R)
        Xp = 0.5 * (Rp[..., :n, :n] + Rp[..., n:, n:])
        Yp = 0.5 * (Rp[..., n:, :n] - Rp[..., :n, n:])
        return Xp, Yp

    Xp, Yp = project(jnp.asarray(X), jnp.asarray(Y))
    jax.block_until_ready(Xp)
    t0 = time.perf_counter()
    Xp, Yp = project(jnp.asarray(X), jnp.asarray(Y))
    jax.block_until_ready(Xp)
    dt = time.perf_counter() - t0
    got = np.asarray(Xp) + 1j * np.asarray(Yp)
    want = np.empty_like(H)
    for i, sl in enumerate(H):
        w, v = np.linalg.eigh(sl)
        want[i] = (v * np.maximum(w, 0.0)) @ v.conj().T
    err = float(np.abs(got - want).max())
    print(json.dumps({
        "backend": jax.default_backend(), "n_complex": n,
        "realified": 2 * n, "K": K, "ms": round(dt * 1e3, 2),
        "max_abs_err_vs_lapack": float(f"{err:.3e}"),
        "finite": bool(np.isfinite(got).all())}), flush=True)


if __name__ == "__main__":
    main()
