"""Basis pursuit: sparse signal recovery (script form of the reference's
``notebooks/basis_pursuit.ipynb``).

Reconstruct a K-sparse signal x (N=1000) from M=100 noisy-free random
projections by solving  min |y - Ax|^2 + alpha |z|_1  s.t. z = x.
Then sweep the regularization path over 64 values of alpha in ONE batched
solve — the part the reference cannot do.
"""
import os

import numpy as np

import jax

from admmsolver_tpu import (L1Regularizer, LeastSquares, Model,
                            SimpleOptimizer, identity)
from admmsolver_tpu.parallel import BatchedSolver


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    # -- single instance (notebook cells 5-9) --------------------------
    N, M, K = (128, 32, 5) if small else (1000, 100, 20)
    niter = 200 if small else 1000
    nlam = 8 if small else 64
    rng = np.random.RandomState(1234)
    A = rng.randn(M, N)
    xanswer = np.zeros(N)
    xanswer[:K] = rng.randn(K)
    xanswer = rng.permutation(xanswer)
    y = A @ xanswer

    model = Model(
        [LeastSquares(1.0, A, y), L1Regularizer(0.1, N)],
        [(1, 0, identity(N), identity(N))])
    opt = SimpleOptimizer(model)
    opt.solve(niter, rtol=1e-10)
    err = np.abs(np.asarray(opt.x[0]) - xanswer).max()
    print(f"single:  {len(opt._primal_residual)} iterations, "
          f"max recovery error {err:.2e}")

    # -- lambda-path sweep, one compiled batch ------------------------
    lambdas = np.logspace(-3, 1, nlam)
    solver = BatchedSolver(model)
    res = solver.solve({(1, "alpha"): lambdas}, niter=niter, rtol=1e-10)
    nnz = (np.abs(np.asarray(res.x[1])) > 1e-6).sum(axis=1)
    print("lambda path (alpha -> nnz):")
    step = max(1, nlam // 8)
    for a, n, it in zip(lambdas[::step], nnz[::step],
                        np.asarray(res.iterations)[::step]):
        print(f"  alpha={a:9.4f}  nnz={n:4d}  iters={it}")


if __name__ == "__main__":
    main()
