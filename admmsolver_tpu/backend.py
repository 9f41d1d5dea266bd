"""Backend capability checks.

The reference is complex128-first (``/root/reference/src/admmsolver/
optimizer.py:151,159``) and NumPy runs it anywhere; TPU backends are not
so uniform: the axon/v5e backend has **no complex128 support at all** and
complex64 solve graphs are unvalidated end-to-end (a c64 solve graph hung
>40 min in the remote compiler — see CLAUDE.md).  Without a guard, a user
who builds a complex :class:`~admmsolver_tpu.models.problem.Model` and
calls ``solve()`` on a TPU hits that hang blind.

:func:`guard_complex` raises *before* compilation with a pointer to the
supported workflow (:func:`admmsolver_tpu.models.realify.realify_model`,
an exactly trajectory-isomorphic real embedding).  Escape hatch for
backends known to support complex end-to-end:
``ADMMSOLVER_TPU_ALLOW_COMPLEX=1``.
"""
from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["complex_ok_on_backend", "guard_complex"]


def complex_ok_on_backend() -> bool:
    """True when complex solve graphs are validated for the active backend.

    CPU and GPU run complex natively; TPU backends do not (complex128 is
    unimplemented on axon/v5e and complex64 end-to-end is unvalidated).
    """
    if os.environ.get("ADMMSOLVER_TPU_ALLOW_COMPLEX", "") == "1":
        return True
    return jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")


def guard_complex(dtype, where: str = "this solver") -> None:
    """Raise early when a complex state dtype reaches an unvalidated
    backend (instead of hanging in the remote TPU compiler)."""
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        return
    if complex_ok_on_backend():
        return
    raise ValueError(
        f"Complex state dtype {np.dtype(dtype).name} requested for "
        f"{where}, but the active '{jax.default_backend()}' backend has "
        "no validated complex support (complex128 is unimplemented on "
        "this TPU; complex64 solve graphs hang in the remote compiler). "
        "Embed the problem as real instead — it is exactly trajectory-"
        "isomorphic and keeps operator structure:\n"
        "    from admmsolver_tpu import realify_model\n"
        "    rm = realify_model(model)\n"
        "    # solve rm.model, then rm.decode_x(x)\n"
        "or set ADMMSOLVER_TPU_ALLOW_COMPLEX=1 to bypass this check on a "
        "backend you have validated.")
