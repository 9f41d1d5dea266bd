"""Stencil-helper tests (reference ``/root/reference/test/test_util.py``)."""
import numpy as np

from admmsolver_tpu.utils import second_deriv_prj, smooth_regularizer_coeff, norm


def test_second_deriv_prj():
    """f(x) = x^2 has constant second derivative 2 on any mesh."""
    xmax = 3
    N = 1000
    x = np.linspace(0, np.sqrt(xmax), N) ** 2  # non-uniform mesh
    prj = second_deriv_prj(x)
    ypp = prj @ (x ** 2)
    np.testing.assert_allclose(ypp, np.full(N - 2, 2.0))


def test_smooth_regularizer_coeff():
    omega_min, omega_max = 0.0, 3.0
    N = 10000
    omega = np.linspace(np.sqrt(omega_min), np.sqrt(omega_max), N) ** 2
    prj = smooth_regularizer_coeff(omega)
    ypp = 2
    assert np.abs(np.linalg.norm(prj @ omega ** 2) ** 2 -
                  (omega_max - omega_min) * ypp ** 2) < 1e-2


def test_norm():
    assert np.isclose(norm(np.array([3.0, 4.0])), 5.0)
