"""Robust PCA (additive model family).

Decompose a corrupted data matrix ``Y = L + S`` into a low-rank part
``L`` and a sparse outlier part ``S`` by solving
``min_L ||L||_* + lam |Y - L|_1`` (nuclear-norm + offset-L1; the
spectral analogue of the reference's elementwise soft-threshold,
``objectivefunc.py:335-355``).  The batched section decomposes many
matrices (e.g. video frames, per-sensor windows) in one compiled graph
with per-instance ``Y`` through the offset batch field.
"""
import os

import numpy as np

from admmsolver_tpu import SimpleOptimizer
from admmsolver_tpu.models.applications import rpca_model
from admmsolver_tpu.parallel import BatchedSolver


def make_instance(rng, m=40, n=30, rank=3, p_corrupt=0.05):
    L0 = rng.randn(m, rank) @ rng.randn(rank, n)
    S0 = np.zeros((m, n))
    mask = rng.rand(m, n) < p_corrupt
    S0[mask] = 8.0 * rng.randn(mask.sum())
    return L0, S0, L0 + S0


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    niter = 300 if small else 1500
    rng = np.random.RandomState(0)
    L0, S0, Y = make_instance(rng, m=12, n=10) if small \
        else make_instance(rng)

    opt = SimpleOptimizer(rpca_model(Y))
    opt.solve(niter)
    L = np.asarray(opt.x[0]).real.reshape(Y.shape)
    S = Y - L
    sv = np.linalg.svd(L, compute_uv=False)
    print(f"single: rel err(L) = "
          f"{np.abs(L - L0).max() / np.abs(L0).max():.4f}, "
          f"effective rank = {int(np.sum(sv > 1e-6 * sv[0]))}, "
          f"sparse support error = "
          f"{np.mean((np.abs(S) > 0.1) != (np.abs(S0) > 0)):.4f}")

    # batched: one compiled graph, per-instance Y
    B = 3 if small else 8
    inst = [make_instance(rng, m=12, n=10) if small else
            make_instance(rng) for _ in range(B)]
    Ys = np.stack([Y_ for (_, _, Y_) in inst])
    bs = BatchedSolver(rpca_model(Ys[0]))
    res = bs.solve({(1, "offset"): Ys.reshape(B, -1)}, niter=niter,
                   record_residuals=False)
    errs = [np.abs(np.asarray(res.x[0][b]).reshape(Ys[0].shape)
                   - inst[b][0]).max() / np.abs(inst[b][0]).max()
            for b in range(B)]
    print(f"batched x{B}: max rel err(L) = {max(errs):.4f}, "
          f"converged = {int(np.asarray(res.converged).sum())}/{B}")


if __name__ == "__main__":
    main()
