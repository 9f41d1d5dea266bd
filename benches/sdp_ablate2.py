"""Second-stage bisection of the SDP f32 anomaly (see sdp_ablate.py).

sdp_ablate.py showed each block is FASTER in f32 in isolation, but the
full LS+PSD model is 5x slower in f32 than f64 — an interaction, not an
op cost.  This probe perturbs one ingredient at a time on the full
model in f32:

  noeigh  : psd_project monkeypatched to an elementwise clip (keeps the
            reshape/moveaxis traffic, removes eigh)
  defprec : spectral-solve GEMMs at default precision (1-pass bf16)
            instead of HIGHEST (removes the multi-pass f32 emulation)
  base    : untouched, for reference + XLA cost analysis per dtype

One JSON line per measurement, plus cost_analysis flops/bytes.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _bench(bs, ov, niter, B, repeats=2):
    import jax

    kw = dict(niter=niter, rtol=0.0, record_residuals=False,
              chunked_checks=True, batch_size=B)
    out = bs.solve(ov, **kw)
    jax.block_until_ready(out.x)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = bs.solve(ov, **kw)
        jax.block_until_ready(out.x)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import admmsolver_tpu.models.objectivefunc as of
    import admmsolver_tpu.ops.prox as prox
    from admmsolver_tpu.models.applications import sdp_model
    from admmsolver_tpu.parallel import BatchedSolver

    k, rest, B, niter = 8, 16, 256, 100
    shape = (k, k, rest)
    N = k * k * rest
    M = N // 2
    rng = np.random.RandomState(3)
    A = rng.randn(M, N)
    xt = np.zeros(shape)
    for r in range(rest):
        Q = rng.randn(k, k)
        xt[:, :, r] = Q @ Q.T / k
    y = A @ xt.reshape(-1)
    ys = y[None, :] + 1e-4 * rng.randn(B, M)

    emit = lambda **kw: print(json.dumps(kw), flush=True)
    emit(backend=jax.default_backend(), B=B, N=N, M=M, niter=niter)

    def run(tag, dtype):
        model = sdp_model(A, y, shape, axis=2)
        bs = BatchedSolver(model, dtype=dtype)
        ov = {(0, "y"): jnp.asarray(ys, dtype=dtype)}
        t = _bench(bs, ov, niter, B)
        emit(variant=tag, dtype=dtype.__name__,
             instance_iters_per_s=round(B * niter / t, 1),
             ms_per_iter=round(1e3 * t / niter, 3))

    # base f32 (fresh process-level compile; anchors the comparison)
    run("base", jnp.float32)

    # noeigh: clip instead of eigh, same data movement
    orig_psd = prox.psd_project

    def clip_project(h, shp, axis):
        m = jnp.moveaxis(h.reshape(h.shape[:-1] + shp),
                         axis - len(shp), -1)
        m = jnp.maximum(m, 0.0)  # stand-in for the spectral clamp
        m = jnp.moveaxis(m, -1, axis - len(shp))
        return m.reshape(h.shape)

    prox.psd_project = clip_project
    of.psd_project = clip_project       # from-import alias in objectivefunc
    try:
        run("noeigh", jnp.float32)
    finally:
        prox.psd_project = orig_psd
        of.psd_project = orig_psd

    # defprec: spectral GEMMs at default (1-pass bf16) precision — drops
    # the explicit precision=HIGHEST request in _apply_B
    orig_matmul = jnp.matmul

    def matmul_def(a, b, precision=None, **kwargs):
        # drop only `precision`; forward everything else untouched
        return orig_matmul(a, b, **kwargs)

    jnp.matmul = matmul_def
    try:
        run("defprec", jnp.float32)
    finally:
        jnp.matmul = orig_matmul

    # cost analysis of the base model per dtype
    for dtype in (jnp.float32, jnp.float64):
        model = sdp_model(A, y, shape, axis=2)
        bs = BatchedSolver(model, dtype=dtype)
        from admmsolver_tpu.config import ADMMConfig
        cfg = ADMMConfig(niter=niter, interval_update_mu=100)
        runf = bs._compiled(cfg, ((0, "y"),), False, True, 1)
        x = tuple(jnp.zeros((B, n), dtype=dtype)
                  for n in bs.plan.block_sizes)
        h = tuple(jnp.zeros((B, s), dtype=dtype)
                  for s in bs.plan.pair_sizes)
        mu = jnp.full((B, bs.plan.npairs), 1.0, dtype=dtype)
        done0 = jnp.zeros(B, dtype=bool)
        args = ((jnp.asarray(ys, dtype=dtype),), x, h, mu,
                (0.0, 0.0), done0)
        lowered = jax.jit(runf).lower(*args)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        emit(variant="cost", dtype=dtype.__name__,
             flops=ca.get("flops"),
             bytes_accessed=ca.get("bytes accessed"),
             transcendentals=ca.get("transcendentals"))


if __name__ == "__main__":
    main()
