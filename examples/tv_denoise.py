"""1-D total-variation denoising (additive model family).

Recover a piecewise-constant signal from noise by solving
``min_x 0.5 |x - y|^2 + lam |D x|_1`` with ``D`` the forward-difference
operator.  Demonstrates a *non-identity* coupling (``D x = z`` — the
same machinery the SpM workload uses for its real-frequency projector,
reference ``notebooks/spm.ipynb`` cell 11) across a sweep of lam.
"""
import os

import numpy as np

from admmsolver_tpu import SimpleOptimizer
from admmsolver_tpu.models.applications import tv_denoise_model


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    n, niter = (80, 500) if small else (400, 4000)
    rng = np.random.RandomState(0)
    # piecewise-constant truth, three levels
    truth = np.r_[np.zeros(n // 3), 1.5 * np.ones(n // 3),
                  0.5 * np.ones(n - 2 * (n // 3))]
    y = truth + 0.25 * rng.randn(n)

    for lam in (0.05, 0.5, 5.0):
        opt = SimpleOptimizer(tv_denoise_model(y, lam))
        opt.solve(niter)
        x = np.asarray(opt.x[0]).real
        jumps = int(np.sum(np.abs(np.diff(x)) > 1e-3))
        err = np.abs(x - truth).mean()
        print(f"lam={lam:5.2f}  mean|x-truth|={err:.4f}  "
              f"jumps={jumps:4d}  (noisy input err="
              f"{np.abs(y - truth).mean():.4f})")


if __name__ == "__main__":
    main()
