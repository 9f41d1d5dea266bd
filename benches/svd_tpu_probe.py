"""Probe: is ``jnp.linalg.svd`` usable on this TPU backend?

``NuclearNormPenalty.prox_diag`` runs one batched SVD per ADMM
iteration; on this backend f64 LU is unimplemented and CPU-passing f64
code has miscompiled before (BENCH_NOTES lessons 1/10/11), so the SVD
path needs the same treatment complex got (``c64_tpu_probe.py``): probe
the capability, record the result, and guard/replace if broken.

Measurements at the rpca example scale (B=64 matrices of 40x30):

  1. standalone batched SVD, f32 and f64         — compile + run + err
  2. SVD traced inside a vmapped while_loop body — the engine regime
     that degrades XLA's eigh ~1000x (benches/sdp_ablate2.py)
  3. the eigh-of-Gram alternative (svd_via_gram) in the same loop body

Prints one JSON line per measurement; run under ``timeout`` — a hang IS
the failure mode being probed.  ``--cpu`` for a smoke run.

Probe result (2026-08-21, axon/v5e): **f32 jnp.linalg.svd crashes the
TPU compiler** (tpu_compile_helper SIGABRT) both standalone and inside
the loop — the same hard-failure class as complex64.  f64 SVD compiles
but is (a) only ~3e-7 accurate even standalone (XLA's TPU SVD is not a
full-precision LAPACK path) and (b) 268.7 ms/iter traced inside the
vmapped loop vs 27.8 ms/iter for the Gram route (9.7x); f32 Gram runs
at 3.94 ms/iter.  Conclusion: ``NuclearNormPenalty``'s ``auto`` SVD
dispatch (gram on TPU, exact LAPACK SVD elsewhere) is both necessary
(f32) and faster + no less accurate (f64) on this backend.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _med(fn, *args, repeats=3):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), compile_s, out


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    B, m, n = 64, 40, 30
    rng = np.random.RandomState(0)
    X64 = rng.randn(B, m, n)
    print(json.dumps({"probe": "backend",
                      "backend": jax.default_backend()}), flush=True)

    # 1. standalone batched SVD
    for dtype, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        X = jnp.asarray(X64, dtype)
        try:
            f = jax.jit(lambda X: jnp.linalg.svd(X, full_matrices=False))
            t, cs, (U, s, Vh) = _med(f, X)
            rec = jnp.matmul(U * s[..., None, :], Vh)
            err = float(jnp.max(jnp.abs(rec - X)))
            print(json.dumps({"probe": f"svd_standalone_{tag}",
                              "ok": bool(np.isfinite(err) and err < 1e-2),
                              "ms": round(t * 1e3, 3),
                              "compile_s": round(cs, 1),
                              "max_recon_err": float(err)}), flush=True)
        except Exception as e:  # noqa: BLE001 - probe records any failure
            print(json.dumps({"probe": f"svd_standalone_{tag}",
                              "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    # 2/3. inside a vmapped while_loop body (the BatchedSolver regime)
    from admmsolver_tpu.ops.linop import svd_via_gram

    def loop(body):
        def one(x):
            def cond(c):
                k, _ = c
                return k < 20

            def step(c):
                k, x = c
                U, s, Vh = body(x)
                s2 = jnp.maximum(s - 0.05, 0.0)
                return k + 1, jnp.matmul(U * s2[..., None, :], Vh) + 0.05 * x

            _, x = jax.lax.while_loop(cond, step,
                                      (jnp.array(0, jnp.int32), x))
            return x
        return jax.jit(jax.vmap(one))

    for dtype, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        X = jnp.asarray(X64, dtype)
        for name, body in (
                ("xla_svd", lambda x: jnp.linalg.svd(
                    x, full_matrices=False)),
                ("gram_eigh", svd_via_gram)):
            try:
                t, cs, out = _med(loop(body), X)
                err = float(jnp.max(jnp.abs(out)))
                print(json.dumps({
                    "probe": f"svd_in_loop_{name}_{tag}",
                    "ok": bool(np.isfinite(err)),
                    "ms_per_iter": round(t * 1e3 / 20, 3),
                    "compile_s": round(cs, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "probe": f"svd_in_loop_{name}_{tag}", "ok": False,
                    "error": f"{type(e).__name__}: {e}"[:300]}),
                    flush=True)


if __name__ == "__main__":
    main()
