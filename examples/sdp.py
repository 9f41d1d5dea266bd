"""Semidefinite-constrained least squares (BASELINE.json config #4).

Recover a stack of positive-semidefinite k x k slices from noisy linear
measurements by solving  min |y - Ax|^2  s.t.  x ⪰ 0 slice-wise (z = x
coupling, PSD-cone projection prox via one batched ``eigh`` — the
reference loops Python-level ``np.linalg.eigh`` per slice,
``/root/reference/src/admmsolver/objectivefunc.py:320-327``).

Runs a single instance, then a batch of noisy replicas in one compiled
graph.
"""
import os

import numpy as np

from admmsolver_tpu import SimpleOptimizer
from admmsolver_tpu.models.applications import sdp_model
from admmsolver_tpu.parallel import BatchedSolver


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    k, rest = (4, 4) if small else (8, 16)   # PSD slices of k x k
    niter = 300 if small else 2000
    shape = (k, k, rest)
    N = k * k * rest
    M = 2 * N                # overdetermined: recovery is well-posed
    rng = np.random.RandomState(7)

    # ground truth: PSD slices
    xtrue = np.zeros(shape)
    for r in range(rest):
        Q = rng.randn(k, k)
        xtrue[:, :, r] = Q @ Q.T / k
    A = rng.randn(M, N) / np.sqrt(M)     # unit-scale columns
    y = A @ xtrue.reshape(-1) + 0.01 * rng.randn(M)

    model = sdp_model(A, y, shape, axis=2)

    # -- single instance ------------------------------------------------
    opt = SimpleOptimizer(model)
    opt.solve(niter, rtol=1e-10)
    x = np.asarray(opt.x[1]).reshape(shape)
    lam_min = np.linalg.eigvalsh(np.moveaxis(x, 2, 0)).min()
    err = np.abs(x - xtrue).max()
    print(f"single:  {opt.iterations} iterations, "
          f"max err {err:.2e}, min eigenvalue {lam_min:+.1e}")

    # -- batch of noisy replicas in one compiled solve -------------------
    B = 8 if small else 64
    ys = (A @ xtrue.reshape(-1))[None, :] + 0.01 * rng.randn(B, M)
    bs = BatchedSolver(model)
    res = bs.solve({(0, "y"): ys}, niter=niter, rtol=1e-10)
    xb = np.asarray(res.x[1]).reshape(B, *shape)
    lam_min = np.linalg.eigvalsh(np.moveaxis(xb, 3, 1)).min()
    print(f"batch:   {B} instances, "
          f"{int(np.asarray(res.iterations).max())} iterations (max), "
          f"max recovery err {np.abs(xb - xtrue[None]).max():.2e}, "
          f"min eigenvalue {lam_min:+.1e}")


if __name__ == "__main__":
    main()
