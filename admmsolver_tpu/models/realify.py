"""Complex→real embedding: run complex problems on real-only backends.

The reference solver is complex128-first (``/root/reference/src/
admmsolver/optimizer.py:151,159``); this TPU backend has no complex128
support at all and complex64 solve graphs are unvalidated end-to-end (see
CLAUDE.md).  This module maps a complex :class:`~admmsolver_tpu.models.
problem.Model` onto an *exactly trajectory-isomorphic* real model of
doubled sizes, so complex workloads (SpM analytic continuation with
Matsubara data, complex compressed sensing) run on the TPU in plain f32/
f64 arithmetic.

Embedding (interleaved layout): a complex vector ``v ∈ C^n`` becomes
``R(v) = [Re v_0, Im v_0, Re v_1, Im v_1, …] ∈ R^{2n}`` and a complex
matrix ``M`` becomes the real matrix with 2×2 blocks ``[[a, -b], [b, a]]``
per entry (``M = a + ib``).  Then ``R(Mv) = R(M) R(v)``,
``R(M†) = R(M)^T``, ``Re(u†v) = R(u)·R(v)``, and ``‖v‖ = ‖R(v)‖`` — every
piece of the ADMM iteration (Gauss–Seidel sweep, prox solves, dual
ascent, residual norms, convergence predicate, penalty adaptation) maps
term by term, so the real trajectory *is* the complex trajectory
(verified in ``tests/test_realify.py``).

The interleaved layout is chosen so **real** structured operators stay
structured: a real operator acts on interleaved coordinates as
``A ⊗ I_2``, i.e. a :class:`PartialDiagonalMatrix` — real dense couplings
cost two fused RHS columns on the MXU (the exact complex-arithmetic FLOP
count), real diagonals stay diagonal, and identity couplings stay scaled
identities.  Only genuinely complex-valued operators densify.

Objectives map as:

* quadratic blocks (LeastSquares / ConstrainedLeastSquares /
  L2Regularizer) — same class over the embedded operators; the spectral
  solve path sees ``A†A ⊗ I_2`` and keeps its shared (thin)
  eigendecomposition of the small factor.
* separable blocks (L1 / NonNegative / SemiPositiveDefinite) — the
  reference prox consumes only ``h.real`` and returns a real minimizer
  (``objectivefunc.py:193-194,267-268,316``); the embedded prox reads the
  even (Re) lanes and writes zeros to the odd (Im) lanes
  (:class:`RealPartProx`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.linop import (
    DenseMatrix,
    DiagonalMatrix,
    MatrixBase,
    PartialDiagonalMatrix,
    ScaledIdentityMatrix,
    _concrete,
)
from .objectivefunc import (
    ConstrainedLeastSquares,
    L1Regularizer,
    L2Regularizer,
    LeastSquares,
    NonNegativePenalty,
    ObjectiveFunctionBase,
    SemiPositiveDefinitePenalty,
    _mu_diagonal,
)
from .problem import Model

__all__ = ["encode", "decode", "realify_matrix", "realify_objective",
           "realify_model", "RealifiedModel", "RealPartProx"]


def encode(v):
    """Complex ``(..., n)`` → real interleaved ``(..., 2n)``."""
    v = jnp.asarray(v)
    rdt = np.zeros(1, dtype=v.dtype).real.dtype
    out = jnp.stack([v.real, v.imag], axis=-1)
    return out.reshape(v.shape[:-1] + (2 * v.shape[-1],)).astype(rdt)


def decode(v):
    """Real interleaved ``(..., 2n)`` → complex ``(..., n)``."""
    v = jnp.asarray(v)
    pairs = v.reshape(v.shape[:-1] + (v.shape[-1] // 2, 2))
    return jax_lax_complex(pairs[..., 0], pairs[..., 1])


def jax_lax_complex(re, im):
    return re + 1j * im


def _embed_dense(M) -> np.ndarray:
    """Interleaved real embedding of a concrete complex matrix."""
    M = np.asarray(M)
    m, n = M.shape
    R = np.zeros((2 * m, 2 * n), dtype=M.real.dtype)
    R[0::2, 0::2] = M.real
    R[0::2, 1::2] = -M.imag
    R[1::2, 0::2] = M.imag
    R[1::2, 1::2] = M.real
    return R


def _is_real(op: MatrixBase) -> bool:
    import jax

    for leaf in jax.tree_util.tree_leaves(op):
        if np.iscomplexobj(leaf) if not hasattr(leaf, "dtype") else \
                np.issubdtype(np.asarray(leaf).dtype, np.complexfloating):
            c = _concrete(leaf)
            if c is None or np.any(np.asarray(c).imag != 0):
                return False
    return True


def realify_matrix(op: MatrixBase) -> MatrixBase:
    """Structured interleaved embedding of an operator.

    Real operators stay structured (``A ⊗ I_2``); complex ones densify.
    """
    if _is_real(op):
        if isinstance(op, ScaledIdentityMatrix):
            coeff = jnp.real(jnp.asarray(op.coeff))
            if op.is_square():
                return ScaledIdentityMatrix(2 * op.shape[0], coeff)
            return PartialDiagonalMatrix(
                ScaledIdentityMatrix(op.shape, coeff).to_diagonal_matrix(),
                (2,))
        if isinstance(op, DiagonalMatrix):
            d = jnp.real(jnp.asarray(op.diagonals))
            if op.is_square():
                return DiagonalMatrix(jnp.repeat(d, 2))
            return PartialDiagonalMatrix(DiagonalMatrix(d, op.shape), (2,))
        if isinstance(op, PartialDiagonalMatrix):
            inner = op.matrix
            if _is_real(inner):
                return PartialDiagonalMatrix(inner, op.rest_dims + (2,))
        if isinstance(op, DenseMatrix):
            data = op.data
            if np.issubdtype(np.asarray(data).dtype, np.complexfloating):
                data = jnp.real(data)
                op = DenseMatrix(data)
            return PartialDiagonalMatrix(op, (2,))
        return PartialDiagonalMatrix(DenseMatrix(op.asmatrix()), (2,))
    dense = _concrete(op.asmatrix())
    if dense is None:
        raise ValueError(
            "realify_matrix requires concrete operator values for complex "
            "operators (structure is resolved at trace time)")
    return DenseMatrix(jnp.asarray(_embed_dense(dense)))


class RealPartProx(ObjectiveFunctionBase):
    """Embedded separable objective: prox on the Re lanes, zero Im lanes.

    Wraps L1 / NonNegative / SemiPositiveDefinite, whose reference prox
    projects ``h`` to its real part and returns a real minimizer
    (``objectivefunc.py:193-194,267-268,316``): in interleaved
    coordinates that is exactly "prox of the even lanes, zeros in the odd
    lanes".  Penalty diagonals are constant over each (Re, Im) pair (they
    come from embedded Hermitian couplings), so the even-lane diagonal is
    the original diagonal.
    """

    needs_diagonal_mu = True

    def __init__(self, inner: ObjectiveFunctionBase) -> None:
        assert inner.needs_diagonal_mu, type(inner)
        super().__init__(2 * inner.size_x)
        self._inner = inner

    @property
    def batch_fields(self) -> tuple:  # type: ignore[override]
        return self._inner.batch_fields

    def _apply_updates(self, updates: dict) -> None:
        if updates:
            self._inner = self._inner.clone_with(**updates)

    def __call__(self, x) -> float:
        return self._inner(decode(jnp.asarray(x)))

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        assert h is not None
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        n = self._inner.size_x
        h_re = h.reshape(n, 2)[:, 0]
        mu_re = jnp.broadcast_to(mu_diag, (2 * n,)).reshape(n, 2)[:, 0]
        x_re = self._inner.prox_diag(h_re, mu_re)
        out = jnp.stack([x_re, jnp.zeros_like(x_re)], axis=-1)
        return out.reshape(2 * n)


def realify_objective(f: ObjectiveFunctionBase) -> ObjectiveFunctionBase:
    if isinstance(f, ConstrainedLeastSquares):
        return ConstrainedLeastSquares(
            f._alpha, realify_matrix(f._A), encode(f._y),
            realify_matrix(f._C), encode(f._D))
    if isinstance(f, LeastSquares):
        return LeastSquares(f._alpha, realify_matrix(f._A), encode(f._y))
    if isinstance(f, L2Regularizer):
        return L2Regularizer(f._alpha, realify_matrix(f._A))
    if isinstance(f, (L1Regularizer, NonNegativePenalty,
                      SemiPositiveDefinitePenalty)):
        return RealPartProx(f)
    raise TypeError(
        f"realify_objective: unsupported objective {type(f).__name__}")


class RealifiedModel:
    """A real :class:`Model` equivalent to a (possibly complex) one.

    ``.model`` is the embedded real model (block sizes doubled) — run any
    solver on it; ``encode_x``/``decode_x`` convert solver state tuples.
    The real trajectory is the exact image of the complex trajectory the
    reference would produce (tested in ``tests/test_realify.py``).
    """

    def __init__(self, model: Model) -> None:
        self.original = model
        functions = [realify_objective(f) for f in model.functions]
        conds = []
        for (i, j) in model.pairs:
            # Model stores E[(i2,i1)]=E1, E[(i1,i2)]=E2 with i=i2>j=i1
            # (problem.py); rebuild conditions in the same pair order.
            conds.append((j, i, realify_matrix(model.E[(i, j)]),
                          realify_matrix(model.E[(j, i)])))
        self.model = Model(functions, conds)

    def encode_x(self, x: Sequence) -> Tuple:
        return tuple(encode(jnp.asarray(x_)) for x_ in x)

    def decode_x(self, x: Sequence) -> Tuple:
        return tuple(decode(jnp.asarray(x_)) for x_ in x)

    encode = staticmethod(encode)
    decode = staticmethod(decode)


def realify_model(model: Model) -> RealifiedModel:
    return RealifiedModel(model)
