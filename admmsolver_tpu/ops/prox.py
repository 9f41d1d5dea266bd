"""Proximal-operator primitives as pure, fusable JAX functions.

These are the vectorized counterparts of the reference's prox helpers
(``/root/reference/src/admmsolver/objectivefunc.py:330-355`` and the
per-slice eigendecomposition loop at ``objectivefunc.py:320-327``).  All are
branch-free elementwise/matmul expressions so XLA fuses them into the
surrounding sweep; the PSD projection replaces the reference's Python
``for``-loop of ``np.linalg.eigh`` calls with one batched ``eigh`` that XLA
maps over slices on-device.
"""
from __future__ import annotations

import jax.numpy as jnp


def soft_threshold(y, lam):
    """Soft-thresholding shrinkage (reference ``_softmax``).

    ``y - lam`` where ``y > lam``; ``y + lam`` where ``y < -lam``; else 0
    (``objectivefunc.py:335-355``).  Branch-free for the VPU.
    """
    return jnp.sign(y) * jnp.maximum(jnp.abs(y) - lam, 0.0)


def project_nonneg(x):
    """Projection onto the nonnegative orthant (``_project_plus``,
    ``objectivefunc.py:330-333``)."""
    return jnp.maximum(x, 0.0)


def psd_project(x, shape, axis):
    """Project Hermitian slices of a 3-way tensor onto the PSD cone.

    ``x`` is flat of size prod(shape); it is reshaped to ``shape``, sliced
    along ``axis``, and each (hermitian) slice is projected by clamping its
    eigenvalues at zero.  Replaces the reference's sequential slice loop
    (``objectivefunc.py:320-327``) with a single batched ``eigh`` — the
    batch axis maps onto device parallelism instead of Python iteration.
    """
    x3 = x.reshape(shape)
    x3 = jnp.moveaxis(x3, axis, 0)  # (K, n, n)
    # Reference semantics: np.linalg.eigh reads ONLY the lower triangle
    # (UPLO='L'), whereas jnp.linalg.eigh symmetrizes its input.  The
    # slices are NOT exactly Hermitian inside the ADMM loop (the duals h
    # are unconstrained), so build the Hermitian matrix the reference
    # implicitly diagonalizes: lower triangle mirrored, diagonal real.
    lo = jnp.tril(x3, -1)
    eye = jnp.eye(x3.shape[-1], dtype=jnp.real(x3).dtype)
    herm = lo + lo.conj().swapaxes(-1, -2) + jnp.real(x3) * eye
    proj = _psd_project_herm(herm)
    return jnp.moveaxis(proj, 0, axis).ravel()


# Jacobi-vs-XLA-eigh dispatch ceiling for the real PSD projection.
# Module-level so hardware A/B benches (benches/sdp_k32_ab.py) can force
# either path; 256 is the validated envelope of the scan-rolled Jacobi
# (round 5 — sweep-convergence measured to n = 256 in both dtypes,
# hardware-validated at n = 128; the reference handles arbitrary slice
# sizes via its per-slice Python loop, objectivefunc.py:322-327).
JACOBI_MAX_N = 256


def _psd_project_herm(herm):
    """PSD projection of exactly-Hermitian slices ``(K, n, n)``.

    Real n <= JACOBI_MAX_N: the loop-body-safe Jacobi
    eigendecomposition (unrolled for n <= 16, scan-rolled above — XLA's
    eigh degrades ~1000x when traced inside a vmapped solver loop body,
    benches/sdp_ablate2.py).  Complex Hermitian n <= JACOBI_MAX_N/2:
    the realify embedding ``H = X + iY -> R = [[X, -Y], [Y, X]]`` — a
    *-isomorphism, so spectral functions commute with it: project the
    real symmetric 2n x 2n embedding with the same Jacobi path and map
    back.  All-real arithmetic (the TPU backend has no complex support,
    CLAUDE.md).  Anything larger: batched ``jnp.linalg.eigh``.
    """
    n = herm.shape[-1]
    if jnp.iscomplexobj(herm):
        if n <= JACOBI_MAX_N // 2:
            X, Y = jnp.real(herm), jnp.imag(herm)
            top = jnp.concatenate([X, -Y], axis=-1)
            bot = jnp.concatenate([Y, X], axis=-1)
            R = jnp.concatenate([top, bot], axis=-2)     # (K, 2n, 2n)
            Rp = _psd_project_herm(R)
            Xp = 0.5 * (Rp[..., :n, :n] + Rp[..., n:, n:])
            Yp = 0.5 * (Rp[..., n:, :n] - Rp[..., :n, n:])
            return Xp + 1j * Yp
        evals, evecs = jnp.linalg.eigh(herm)
        evals = jnp.maximum(evals, 0.0)
        return jnp.einsum("kij,kj,klj->kil", evecs, evals, evecs.conj())
    if n <= JACOBI_MAX_N:
        from .linop import jacobi_eigh

        evals, evecs = jacobi_eigh(herm, sort=False)
        evals = jnp.maximum(evals, 0.0)
        if n <= 16:
            # Rebuild V diag(w) V^T on the VPU as broadcast-multiply +
            # reduce, NOT einsum/dot_general: batched TINY contractions
            # lower to f64-emulated GEMM loops that cost ~100x more than
            # the elementwise form (BENCH_NOTES lesson 6 — this one op
            # was 7.7 of the 8.6 ms/iter of the f64 SDP engine).  The
            # (K,n,n,n) intermediate is tiny for n <= 16.
            scaled = evecs * evals[..., None, :]            # (K, i, j)
            return jnp.sum(
                scaled[..., :, None, :] * evecs[..., None, :, :],
                axis=-1)                                    # (K, i, l)
        # n = 17..JACOBI_MAX_N: the (K,n,n,n) elementwise intermediate
        # no longer fits comfortably (n=64, K=4096, f64 -> 8 GB); a
        # batched GEMM at this size is substantial enough for the MXU.
        return jnp.matmul(evecs * evals[..., None, :],
                          evecs.swapaxes(-1, -2),
                          precision="highest")
    evals, evecs = jnp.linalg.eigh(herm)
    evals = jnp.maximum(evals, 0.0)
    return jnp.einsum("kij,kj,klj->kil", evecs, evals, evecs.conj())
