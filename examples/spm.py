"""Sparse-modeling (SpM) analytic continuation (script form of the
reference's ``notebooks/spm.ipynb``, hermetic — no sparse_ir download).

Recover a nonnegative, unit-weight spectral function rho(omega) from
noisy imaginary-time kernel data via the three-block model:
ConstrainedLeastSquares (sum rule) + L1 sparsity + NonNegativity through
the real-frequency projector.
"""
import os

import numpy as np

from admmsolver_tpu import SimpleOptimizer
from admmsolver_tpu.models.applications import spm_model, synthetic_spm_data
from admmsolver_tpu.utils import convergence_report


def main(small=None):
    if small is None:
        small = os.environ.get("ADMM_EXAMPLES_SMALL") == "1"
    nl, nw, niter = (12, 25, 500) if small else (30, 61, 10000)
    s, g, prj_sum, prj_w, omega, rho_true = synthetic_spm_data(
        nl=nl, nw=nw, noise=1e-5)

    model = spm_model(s, g, prj_sum, prj_w, alpha_l1=1e-5, sum_value=1.0)
    opt = SimpleOptimizer(model, mu=0.1)
    opt.solve(niter)

    rho = np.asarray(opt.x[2]).real
    rep = convergence_report(opt._primal_residual, opt._dual_residual)
    print(f"iterations: {rep['iterations']}, "
          f"final primal {rep['final_primal']:.2e}, "
          f"dual {rep['final_dual']:.2e}")
    print(f"sum rule: sum(rho) = {rho.sum():.6f} (target 1)")
    print(f"min(rho) = {rho.min():.2e} (>= 0)")
    corr = np.corrcoef(rho, rho_true)[0, 1]
    print(f"correlation with ground truth: {corr:.4f}")


if __name__ == "__main__":
    main()
