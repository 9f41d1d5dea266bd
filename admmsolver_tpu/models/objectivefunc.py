"""Objective functions and their proximal solvers.

TPU-native counterpart of the reference's objective library
(``/root/reference/src/admmsolver/objectivefunc.py:28-355``).  Each
objective knows how to solve its own regularized subproblem

    argmin_x  F(x) + h† x + x† h + x† mu x

(the linear term enters twice, i.e. ``2 Re(h†x)``, matching
``objectivefunc.py:44-53``).

Two interfaces per objective:

* ``solve(h, mu)`` — eager, reference-compatible (accepts a structured
  ``mu`` operator, returns the minimizer).  Quadratic objectives keep the
  reference's one-entry hash-keyed factorization cache
  (``objectivefunc.py:89-96``) for eager use.
* the **factor protocol** used by the jitted ADMM engine: quadratic
  objectives expose ``make_factors(mu_op)`` (expensive — run only at
  penalty-update boundaries, turning the reference's hash cache into a
  static schedule) and ``prox_with_factors(factors, h)`` (cheap — one MXU
  matvec per iteration); separable objectives expose
  ``prox_diag(h, mu_diag)`` with traced diagonal penalties.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linop import (
    DenseMatrix,
    DiagonalMatrix,
    MatrixBase,
    PartialDiagonalMatrix,
    ScaledIdentityMatrix,
    _concrete,
    add,
    asmatrixtype,
    inv_hpd_schur,
    matmul,
    matrix_hash,
)
from ..ops.prox import project_nonneg, psd_project, soft_threshold

__all__ = [
    "ObjectiveFunctionBase",
    "LeastSquares",
    "ConstrainedLeastSquares",
    "L1Regularizer",
    "L2Regularizer",
    "HuberLoss",
    "NonNegativePenalty",
    "NuclearNormPenalty",
    "SemiPositiveDefinitePenalty",
]


class SpectralShift(NamedTuple):
    """Factor state for the spectral-shift solve path.

    When the penalty is a scaled identity (identity-coupled blocks — basis
    pursuit, LASSO, ridge, λ-sweeps), ``B = (alpha A†A + c I)^{-1} =
    U diag(1/(alpha λ + c)) U†`` with ONE eigendecomposition of the
    *shared* Gram matrix, computed at trace time.  The per-instance factor
    state is just the scalar shift ``c`` — "refactorization" at penalty
    updates is free arithmetic, and the per-iteration solve is two GEMMs
    against the shared eigenvector matrix (MXU-resident, batchable over
    thousands of instances with no per-instance O(N³) work or O(N²)
    factor storage).  This replaces the reference's hash-keyed inverse
    cache (``objectivefunc.py:89-96``) with something strictly stronger
    on TPU: exact for every shift value, never recomputed.
    """

    shift: jnp.ndarray


def _inv_hpd(m: MatrixBase) -> MatrixBase:
    """Structure-aware inverse of a Hermitian positive-definite operator.

    Dense blocks use a Cholesky-based inverse (the reference calls plain
    ``np.linalg.inv``, ``objectivefunc.py:11,94``; Cholesky is cheaper and
    better conditioned for HPD operands, per BASELINE.json's directive).
    The explicit inverse — rather than per-iteration triangular solves — is
    deliberate: on TPU a cached ``B @ h`` matvec is one MXU pass, while
    triangular solves serialize badly; the inverse cost is amortized over
    the ``interval_update_mu`` iterations between penalty updates.
    """
    if isinstance(m, DenseMatrix):
        d = m.data
        if d.shape[-1] <= 128:
            # Unrolled Schur-block inverse: XLA's batched Cholesky lowers
            # to a sequential dynamic-slice loop costing ~1 s per refactor
            # at (4096, 30, 30) on TPU in ANY dtype (loop overhead, not
            # FLOPs); the straight-line VPU recursion is ~100x cheaper.
            return DenseMatrix(inv_hpd_schur(d))
        eye = jnp.eye(d.shape[0], dtype=d.dtype)
        c, low = jax.scipy.linalg.cho_factor(d)
        return DenseMatrix(jax.scipy.linalg.cho_solve((c, low), eye))
    if isinstance(m, PartialDiagonalMatrix):
        return PartialDiagonalMatrix(_inv_hpd(m.matrix), m.rest_dims)
    from ..ops.linop import BandedMatrix, inv_qr, tridiag_cr_factor

    if isinstance(m, BandedMatrix):
        if set(m.offsets) <= {-1, 0, 1}:
            # Tridiagonal SPD (TV/stencil penalties): cyclic-reduction
            # factor — O(N) state and O(N log N) straight-line solves,
            # never a dense N x N inverse (see TridiagFactor).
            n = m.shape[0]
            z = jnp.zeros(n, dtype=m.bands.dtype)
            get = {o: m.bands[k] for k, o in enumerate(m.offsets)}
            return tridiag_cr_factor(get.get(-1, z), get.get(0, z),
                                     get.get(1, z))
        # wider bands: dense factor (correct, loses the O(N) scaling)
        return DenseMatrix(inv_qr(m.asmatrix())) if m.shape[0] > 128 \
            else DenseMatrix(inv_hpd_schur(m.asmatrix()))
    return m.inv()


def _real_if_complex(h):
    return h.real if jnp.iscomplexobj(h) else h


def _matvec_vpu(M, v):
    """Dense matvec as a broadcast multiply + lane reduction.

    The engine applies *per-lane* factor matrices under ``vmap``; XLA
    lowers a vmapped ``M @ v`` to a batched tiny GEMV via ``dot_general``,
    which on TPU in emulated f64 costs ~17.5 ms/iteration at
    (4096, 30, 30) — the mul+reduce formulation of the same contraction
    runs on the VPU at ~0.14 ms (125x; BENCH_NOTES.md).  Shapes: ``M``
    ``(..., m, n)`` (or :class:`DenseMatrix`), ``v`` ``(..., n)`` →
    ``(..., m)``.
    """
    from ..ops.linop import _match_precision

    if isinstance(M, MatrixBase) and not isinstance(M, DenseMatrix):
        return M @ v  # structured operators have cheap matvecs already
    d = M.data if isinstance(M, DenseMatrix) else jnp.asarray(M)
    d = _match_precision(d, v.dtype)
    return jnp.sum(d * v[..., None, :], axis=-1)


def _mu_diagonal(mu: MatrixBase):
    """Effective diagonal of a penalty operator.

    Accepts diagonal, scaled-identity, and Kronecker-with-diagonal-factor
    penalties, mirroring ``objectivefunc.py:296-310``.
    """
    d = mu.effective_diagonal()
    if d is None:
        raise TypeError(
            f"Penalty mu of structure {type(mu).__name__} has no diagonal "
            "interpretation; this objective requires a diagonal penalty")
    return d


class ObjectiveFunctionBase:
    """Contract mirror of ``objectivefunc.py:28-53``."""

    #: True when the prox needs a (refactorizable) quadratic solve.
    is_quadratic = False
    #: True when the prox consumes only the diagonal of mu.
    needs_diagonal_mu = False
    #: Per-instance parameters the batched runtime may override
    #: (:mod:`admmsolver_tpu.parallel.batch`); the structure (A, C, E)
    #: stays shared across the batch.
    batch_fields: tuple = ()
    #: When set to a group size ``g``, the prox closed form requires the
    #: effective diagonal penalty to be CONSTANT within each contiguous
    #: group of ``g`` entries (``g == size_x`` → fully uniform).  The
    #: penalty structure is static, so :class:`~admmsolver_tpu.optimizer.
    #: ADMMPlan` verifies this at build time from the concrete coupling
    #: diagonals — a wrong coupling fails at construction, not silently
    #: at runtime inside jit.
    uniform_mu_group: Optional[int] = None

    def __init__(self, size_x: int) -> None:
        self._size_x = int(size_x)

    def clone_with(self, **updates):
        """Shallow copy with per-instance parameters replaced.

        Used by the batched runtime inside ``vmap``: heavy derived
        operators (A†A, couplings) are shared by reference; only cheap
        per-instance values are swapped.  Unknown fields raise.
        """
        import copy as _copy

        if updates:
            unknown = set(updates) - set(self.batch_fields)
            if unknown:
                raise ValueError(
                    f"{type(self).__name__} has no batchable fields "
                    f"{sorted(unknown)}; available: {self.batch_fields}")
        obj = _copy.copy(self)
        obj._apply_updates(updates)
        return obj

    def _apply_updates(self, updates: dict) -> None:
        if updates:
            raise ValueError(
                f"{type(self).__name__} accepts no batch overrides")

    @property
    def size_x(self) -> int:
        return self._size_x

    def __call__(self, x) -> float:
        raise NotImplementedError

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        """Return argmin_x F(x) + h†x + x†h + x† mu x."""
        raise NotImplementedError

    # --- factor protocol (jit engine) ---------------------------------
    def make_factors(self, mu_op: MatrixBase):
        return ()

    def prox_with_factors(self, factors, h):
        raise NotImplementedError

    def prox_diag(self, h, mu_diag):
        raise NotImplementedError


class _ShiftedQuadratic:
    """Shared solve machinery for blocks whose prox is
    ``B @ v`` with ``B = (alpha A†A + mu)^{-1}``.

    Two strategies, chosen statically from the penalty structure:

    * **spectral** — scaled-identity penalty + dense concrete Gram:
      shared eigendecomposition, per-instance shift scalar
      (:class:`SpectralShift`).  The TPU fast path.  When ``A`` is a wide
      concrete dense matrix (M < N — compressed sensing, the reference's
      headline basis-pursuit shape), the eigensystem is built from the
      small ``A A†`` (M×M) instead of ``A†A`` (N×N): ``A†A`` has rank
      ≤ M, so ``(alpha A†A + c I)^{-1} v = U_r [(alpha λ_r + c)^{-1} −
      c^{-1}] (U_r† v) + v / c`` with a *thin* (N, r) eigenbasis — the
      two per-iteration GEMMs shrink from (N,N) to (N,r), an N/r FLOP
      cut on the MXU with bit-comparable accuracy (the null-space
      component is handled exactly by the ``v/c`` term).
    * **cached inverse** — anything else: structure-aware Cholesky
      inverse recomputed at penalty-update boundaries (:func:`_inv_hpd`).
    """

    _alpha: object
    _AcA: MatrixBase
    _eig = None
    _eig_thin = None  # (lam_r, U_r) with r = rank(A†A) < N, or False

    def _spectral_inner(self):
        """(dense concrete Gram, kron_rest) if the spectral path applies.

        ``A†A`` may be plain dense, or ``G ⊗ I_rest`` (a
        :class:`PartialDiagonalMatrix` — e.g. the real embedding of a
        complex problem, :mod:`admmsolver_tpu.models.realify`): the
        eigensystem of the small factor G diagonalizes the full Gram
        blockwise, so the solve stays two small GEMMs with ``rest``
        fused right-hand-side columns.
        """
        if isinstance(self._AcA, DenseMatrix):
            d = _concrete(self._AcA.data)
            if d is not None:
                return d, 1
        if isinstance(self._AcA, PartialDiagonalMatrix) and \
                isinstance(self._AcA.matrix, DenseMatrix):
            d = _concrete(self._AcA.matrix.data)
            if d is not None:
                return d, self._AcA._rest
        return None

    def _spectral_ok(self) -> bool:
        return self._spectral_inner() is not None

    def _get_eig(self):
        # Cache NUMPY arrays: jnp arrays materialized inside a jit trace
        # would leak as tracers into later traces.
        if self._eig is None:
            gram, _ = self._spectral_inner()
            self._eig = np.linalg.eigh(np.asarray(gram))
        return self._eig

    def _thin_A(self):
        """Concrete dense wide factor Ad with A†A = (Ad†Ad) ⊗ I_rest, or
        None."""
        A_op = getattr(self, "_A", None)
        if isinstance(A_op, PartialDiagonalMatrix):
            A_op = A_op.matrix
        if not isinstance(A_op, DenseMatrix):
            return None
        A = _concrete(A_op.data)
        if A is None or A.shape[0] >= A.shape[1]:
            return None
        return A

    def _get_eig_thin(self):
        """Thin eigensystem of A†A via the small Gram A A†, or False.

        Available when ``A`` itself is concrete dense with fewer rows
        than columns.  From ``A A† = W Σ² W†``: ``λ_r = σ²``,
        ``U_r = A† W σ^{-1}`` (exactly orthonormal in exact arithmetic).
        Numerically-null rows (σ² ≤ N·eps·σ²_max) are dropped — their
        exact treatment is the closed-form ``v/c`` null-space term.
        """
        if self._eig_thin is None:
            A = self._thin_A()
            if A is None:
                self._eig_thin = False
            else:
                AAc = np.asarray(A) @ np.asarray(A).conj().T
                lam, W = np.linalg.eigh(AAc)
                tol = AAc.shape[0] * np.finfo(lam.dtype).eps * \
                    max(lam.max(initial=0.0), 0.0)
                keep = lam > tol
                lam = lam[keep]
                U_r = (np.asarray(A).conj().T @ W[:, keep]) / np.sqrt(lam)
                self._eig_thin = (lam, U_r)
        return self._eig_thin

    def make_factors(self, mu_op: MatrixBase):
        """B = (alpha A†A + mu)^{-1}: spectral shift or explicit inverse."""
        if isinstance(mu_op, ScaledIdentityMatrix) and self._spectral_ok():
            return SpectralShift(jnp.asarray(mu_op.coeff))
        return _inv_hpd(add(self._AcA * self._alpha, mu_op))

    def _apply_B(self, factors, rhs):
        if isinstance(factors, SpectralShift):
            from ..ops.linop import _match_precision

            # Full f32 MXU precision: the TPU default is single-pass bf16
            # (~1e-3 relative), which corrupts the solve and flips
            # penalty-adaptation decisions.
            hi = jax.lax.Precision.HIGHEST
            shift = factors.shift
            cs = _concrete(shift)
            _, rest = self._spectral_inner()
            # Kronecker Gram (G ⊗ I_rest): fold the rest axis into RHS
            # columns; the eigenbasis of G applies blockwise.
            r2 = rhs if rest == 1 else rhs.reshape(rhs.shape[0] // rest, -1)
            thin = self._get_eig_thin()
            # The thin form divides by the shift; a (concrete) zero shift
            # must take the full-basis form instead.  PRECONDITION for a
            # *traced* shift: the runtime value must be > 0 — true for the
            # engine, whose mu schedule starts at mu0 > 0 and only ever
            # multiplies/divides by fact_incr (reference optimizer.py:
            # 277-299 keeps mu in (0, max_mu]); a traced zero would
            # produce inf/NaN here rather than falling back.
            if thin is not False and not (cs is not None and
                                          np.all(np.asarray(cs) == 0)):
                lam, U_r = thin
                lam = _match_precision(jnp.asarray(lam), rhs.dtype)
                U_r = _match_precision(jnp.asarray(U_r), rhs.dtype)
                w = jnp.matmul(U_r.conj().T, r2, precision=hi)
                coef = 1.0 / (self._alpha * lam + shift) - 1.0 / shift
                w = w * (coef if w.ndim == 1 else coef[:, None])
                out = jnp.matmul(U_r, w, precision=hi) + r2 / shift
                return out.reshape(rhs.shape)
            lam, U = self._get_eig()
            lam = _match_precision(jnp.asarray(lam), rhs.dtype)
            U = _match_precision(jnp.asarray(U), rhs.dtype)
            w = jnp.matmul(U.conj().T, r2, precision=hi)
            denom = self._alpha * lam + shift
            w = w / (denom if w.ndim == 1 else denom[:, None])
            return jnp.matmul(U, w, precision=hi).reshape(rhs.shape)
        if rhs.ndim == 1:
            # Per-lane dense/Kronecker factor application: VPU mul+reduce
            # (vmapped dot_general is pathological in f64 — see
            # _matvec_vpu).  2-D rhs occurs only at factor time (xi2
            # precompute), where the plain dot is fine.
            if isinstance(factors, DenseMatrix):
                return _matvec_vpu(factors, rhs)
            if isinstance(factors, PartialDiagonalMatrix) and \
                    isinstance(factors.matrix, DenseMatrix):
                from ..ops.linop import _match_precision

                d = _match_precision(factors.matrix.data, rhs.dtype)
                m = d.shape[-1]
                r2 = rhs.reshape(rhs.shape[:-1] + (m, rhs.shape[-1] // m))
                out = jnp.sum(d[..., :, :, None] * r2[..., None, :, :],
                              axis=-2)
                return out.reshape(rhs.shape)
        return factors @ rhs


class LeastSquares(_ShiftedQuadratic, ObjectiveFunctionBase):
    """``alpha * ||y - A x||_2^2`` (reference ``objectivefunc.py:56-110``)."""

    is_quadratic = True
    batch_fields = ("alpha", "y", "Acy", "A")

    def _apply_updates(self, updates: dict) -> None:
        if "A" in updates:
            # Per-instance operator batching (the reference solves one
            # SimpleOptimizer per problem with arbitrary operators,
            # optimizer.py:121-152; here a different dense A per lane
            # rides the vmapped clone machinery).  The traced A disables
            # the shared spectral path (_spectral_inner sees no concrete
            # Gram), so factors fall through to the per-lane
            # inv_hpd_schur dense inverse — the batched runtime enforces
            # n <= 128 for exactly this reason (HBM invariant: no
            # per-lane dense factor state at B>=1k x N>=512).  All the
            # derived products below are traced lazily: unused ones
            # (e.g. _AcA inside the sweep body) are dead-code-eliminated
            # by XLA, so only the factor boundary pays for them.
            self._A = asmatrixtype(jnp.asarray(updates["A"]))
            self._Ac = self._A.conjugate().T
            self._AcA = matmul(self._Ac, self._A)
            self._Acy = self._Ac @ self._y
            self._eig = None
            self._eig_thin = None
        if "alpha" in updates:
            self._alpha = updates["alpha"]
        if "y" in updates:
            self._y = jnp.asarray(updates["y"])
            self._Acy = self._Ac @ self._y
        if "Acy" in updates:
            # Precomputed A†y override (batched prologue computes it once
            # per instance so the loop body carries no A†y matvec).
            self._Acy = updates["Acy"]
        self._B_cache = (None, None)

    def __init__(self, alpha: float, A: Union[np.ndarray, MatrixBase], y) -> None:
        assert A.ndim == 2
        A = asmatrixtype(A)
        y = jnp.asarray(y)
        assert y.ndim == 1
        assert A.shape[0] == y.shape[0]
        super().__init__(A.shape[1])
        self._alpha = alpha
        self._A = A
        self._y = y
        self._Ac = A.conjugate().T
        self._AcA = matmul(self._Ac, A)
        self._Acy = self._Ac @ y  # array; reused every iteration
        self._Nx = A.shape[1]
        self._B_cache = (None, None)  # eager-path one-entry cache
        self._eig = None  # lazy shared eigendecomposition of A†A

    def __call__(self, x) -> float:
        diff = self._y - (self._A @ x)
        val = self._alpha * jnp.real(jnp.vdot(diff, diff))
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    # --- eager path ----------------------------------------------------
    def _get_B(self, mu: MatrixBase) -> MatrixBase:
        try:
            key = matrix_hash(mu)
        except TypeError:
            return self.make_factors(mu)
        if self._B_cache[0] != key:
            self._B_cache = (key, self.make_factors(mu))
        return self._B_cache[1]

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            h = jnp.zeros(self._Nx)
        if mu is None:
            mu = DiagonalMatrix(jnp.zeros(self._Nx))
        assert h.shape == (self._Nx,)
        assert mu.shape == (self._Nx, self._Nx)
        return self.prox_with_factors(self._get_B(mu), h)

    # --- factor protocol ----------------------------------------------
    def prox_with_factors(self, factors, h):
        from ..ops.linop import _match_precision

        Acy = _match_precision(self._Acy, h.dtype)
        return self._apply_B(factors, self._alpha * Acy - h)


class ConstrainedLeastSquares(LeastSquares):
    """``alpha * ||y - A x||² s.t. C x = D`` exactly, by Lagrange block
    elimination (reference ``objectivefunc.py:113-157``)."""

    batch_fields = ("alpha", "y", "Acy", "D", "A")

    def _apply_updates(self, updates: dict) -> None:
        D = updates.pop("D", None)
        super()._apply_updates(updates)
        if D is not None:
            self._D = jnp.asarray(D)

    def __init__(self, alpha, A, y, C, D) -> None:
        assert C.ndim == 2
        C_ = asmatrixtype(C)
        D = jnp.asarray(D)
        assert D.ndim == 1
        assert A.shape[1] == C_.shape[1]
        assert C_.shape[0] == D.shape[0]
        super().__init__(alpha, A, y)
        self._C = C_
        self._D = D

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            h = jnp.zeros(self._Nx)
        if mu is None:
            mu = ScaledIdentityMatrix(self._Nx, 0.0)
        assert h.shape == (self._Nx,)
        assert mu.shape == (self._Nx, self._Nx)
        return self.prox_with_factors(self._get_B(mu), h)

    def make_factors(self, mu_op: MatrixBase):
        """Precompute (B, xi2 = -B C†, S^{-1} = (C xi2)^{-1}).

        The reference recomputes ``xi2`` and the small (Nc×Nc) inverse every
        call (``objectivefunc.py:148-157``); both depend only on B, so the
        engine hoists them to penalty-update boundaries.
        """
        B = super().make_factors(mu_op)
        Ch = self._C.conjugate().T
        xi2 = -self._apply_B(B, Ch.asmatrix())
        S = self._C @ xi2
        # S = -C B C† with B PD, so -S is HPD: small constraint counts use
        # the unrolled Schur inverse (batched QR has the same sequential-
        # loop overhead on TPU as batched Cholesky); large ones the QR
        # path (f64 LU is unimplemented on the TPU backend).
        from ..ops.linop import inv_hpd_schur, inv_qr

        if S.shape[-1] <= 128:
            Sinv = -inv_hpd_schur(-S)
        else:
            Sinv = inv_qr(S)
        return (B, xi2, Sinv)

    def prox_with_factors(self, factors, h):
        B, xi2, Sinv = factors
        xi1 = self._apply_B(B, self._alpha * self._Acy - h)
        # Small per-lane matvecs (C xi1 is (Nc,), S^{-1} is (Nc,Nc), xi2 is
        # (Nx,Nc)) as VPU contractions — vmapped f64 dot_general on tiny
        # batched operands is ~100x slower on TPU (see _matvec_vpu).
        nu = _matvec_vpu(Sinv, self._D - _matvec_vpu(self._C, xi1))
        return xi1 + _matvec_vpu(xi2, nu)


class L1Regularizer(ObjectiveFunctionBase):
    """``F(x) = alpha |x - offset|_1`` (reference ``objectivefunc.py:
    160-195``; ``offset`` is additive — ``None`` reproduces the
    reference's plain L1 exactly).

    The offset makes affine-data sparsity terms expressible without a
    new block (e.g. robust PCA's ``|Y - L|_1``, :func:`rpca_model`): by
    the substitution ``z = x - offset`` the prox reduces to the plain
    soft-threshold on a shifted dual, ``x = offset +
    soft(-h/mu - offset, alpha/(2 mu))``.  ``offset`` is per-instance
    overridable in the batched runtime (``batch_fields``).
    """

    needs_diagonal_mu = True
    batch_fields = ("alpha", "offset")

    def _apply_updates(self, updates: dict) -> None:
        if "alpha" in updates:
            self._alpha = updates["alpha"]
        if "offset" in updates:
            self._offset = jnp.asarray(updates["offset"])

    def __init__(self, alpha: float, size_x: int, offset=None) -> None:
        assert isinstance(size_x, (int, np.integer)), type(size_x)
        super().__init__(size_x)
        assert alpha > 0
        self._alpha = alpha
        if offset is not None:
            offset = jnp.asarray(offset)
            assert offset.shape == (size_x,), offset.shape
        self._offset = offset

    def __call__(self, x) -> float:
        from ..ops.linop import _match_precision

        x = jnp.asarray(x)
        v = x if self._offset is None else \
            x - _match_precision(self._offset, x.dtype)
        val = self._alpha * jnp.sum(jnp.abs(v))
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            raise ValueError("h must not be None!")
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        from ..ops.linop import _match_precision

        h = _real_if_complex(h)
        thr = 0.5 * self._alpha / mu_diag
        if self._offset is None:
            return soft_threshold(-(h / mu_diag), thr)
        # precision follows the state dtype: a stored-f64 offset must not
        # silently promote an f32 phase to emulated-f64 arithmetic
        y = _match_precision(_real_if_complex(self._offset), h.dtype)
        return y + soft_threshold(-(h / mu_diag) - y, thr)


class L2Regularizer(_ShiftedQuadratic, ObjectiveFunctionBase):
    """``F(x) = alpha |A x|_2^2`` — generalized ridge / smoothness
    (reference ``objectivefunc.py:198-242``)."""

    is_quadratic = True
    batch_fields = ("alpha",)

    def _apply_updates(self, updates: dict) -> None:
        if "alpha" in updates:
            self._alpha = updates["alpha"]
        self._B_cache = (None, None)

    def __init__(self, alpha: float, A: Union[np.ndarray, MatrixBase]) -> None:
        A = asmatrixtype(A)
        super().__init__(A.shape[1])
        assert alpha > 0
        self._alpha = alpha
        self._A = A
        self._AcA = matmul(A.conjugate().T, A)
        self._B_cache = (None, None)

    def __call__(self, x) -> float:
        Ax = self._A @ x
        val = self._alpha * jnp.real(jnp.vdot(Ax, Ax))
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    def _get_B(self, mu: MatrixBase) -> MatrixBase:
        try:
            key = matrix_hash(mu)
        except TypeError:
            return self.make_factors(mu)
        if self._B_cache[0] != key:
            self._B_cache = (key, self.make_factors(mu))
        return self._B_cache[1]

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if mu is None:
            mu = ScaledIdentityMatrix(self._A.shape[1], 0.0)
        if h is None:
            return jnp.zeros(self._A.shape[1])
        return self.prox_with_factors(self._get_B(mu), h)

    def prox_with_factors(self, factors, h):
        return -self._apply_B(factors, h)


class NonNegativePenalty(ObjectiveFunctionBase):
    """``F(x) = infty * Theta(-x)`` (reference ``objectivefunc.py:245-271``)."""

    needs_diagonal_mu = True

    def __init__(self, size_x: int) -> None:
        super().__init__(size_x)

    def __call__(self, x) -> float:
        return 0.0

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        assert h is not None
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        h = _real_if_complex(h)
        return project_nonneg(-(h / mu_diag))


class BoxProjectionPenalty(ObjectiveFunctionBase):
    """Indicator of the box ``lo <= x <= hi`` (additive; no reference
    counterpart — generalizes ``NonNegativePenalty``,
    reference ``objectivefunc.py:245-271``, to arbitrary bounds).

    Prox is the box projection ``clip(-h/mu, lo, hi)`` — branch-free
    elementwise VPU code, fused into the surrounding sweep by XLA.
    Bounds may be scalars or per-coordinate arrays, and are per-instance
    overridable in the batched runtime (``batch_fields``).
    """

    needs_diagonal_mu = True
    batch_fields = ("lo", "hi")

    def _apply_updates(self, updates: dict) -> None:
        if "lo" in updates:
            self._lo = jnp.asarray(updates["lo"])
        if "hi" in updates:
            self._hi = jnp.asarray(updates["hi"])

    def __init__(self, size_x: int, lo=0.0, hi=1.0) -> None:
        super().__init__(size_x)
        lo_c, hi_c = np.asarray(lo), np.asarray(hi)
        if lo_c.ndim:
            assert lo_c.shape == (size_x,), lo_c.shape
        if hi_c.ndim:
            assert hi_c.shape == (size_x,), hi_c.shape
        assert np.all(lo_c <= hi_c), "empty box: lo > hi"
        self._lo = jnp.asarray(lo)
        self._hi = jnp.asarray(hi)

    def __call__(self, x) -> float:
        return 0.0

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        assert h is not None
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        h = _real_if_complex(h)
        return jnp.clip(-(h / mu_diag), self._lo, self._hi)


class GroupL1Regularizer(ObjectiveFunctionBase):
    """``F(x) = alpha * sum_g ||x_g||_2`` over ``n_groups`` equal,
    contiguous groups of ``group_size`` (group lasso; additive — no
    reference counterpart, extends ``L1Regularizer``,
    reference ``objectivefunc.py:160-195``, to block sparsity).

    Equal contiguous groups keep the prox a static reshape plus
    full-width VPU math (no ragged segments, no gathers): with uniform
    penalty ``mu_g`` per group, ``argmin F(x) + 2 Re(h^T x) + mu|x|^2``
    is the group soft-threshold
    ``v_g * max(1 - (alpha/(2 mu_g)) / ||v_g||, 0)`` with
    ``v = -h/mu`` — the blockwise generalization of the reference's
    ``_softmax`` (``objectivefunc.py:335-355``).

    The closed form requires ``mu`` constant within each group.  That
    holds for every identity/ScaledIdentity coupling (which produce
    scaled-identity penalties); the eager ``solve`` path checks it on
    concrete values, the jit engine (where data-dependent checks cannot
    run) documents it as a contract.
    """

    needs_diagonal_mu = True
    batch_fields = ("alpha",)

    def _apply_updates(self, updates: dict) -> None:
        if "alpha" in updates:
            self._alpha = updates["alpha"]

    def __init__(self, alpha: float, group_size: int,
                 n_groups: int) -> None:
        assert alpha > 0
        assert group_size >= 1 and n_groups >= 1
        super().__init__(int(group_size) * int(n_groups))
        self._alpha = alpha
        self._gs = int(group_size)
        self._ng = int(n_groups)
        # engine contract, verified statically at ADMMPlan build
        self.uniform_mu_group = self._gs

    def __call__(self, x) -> float:
        xg = jnp.reshape(x, x.shape[:-1] + (self._ng, self._gs))
        val = self._alpha * jnp.sum(
            jnp.sqrt(jnp.sum(jnp.abs(xg) ** 2, axis=-1)))
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            raise ValueError("h must not be None!")
        if mu is None:
            raise ValueError("mu must not be None!")
        mu_diag = _mu_diagonal(mu)
        md = np.asarray(mu_diag)
        mg = md.reshape(-1, self._gs)
        if not np.allclose(mg, mg[:, :1]):
            raise ValueError(
                "GroupL1Regularizer needs a blockwise-uniform penalty "
                "(constant mu within each group); couple this block "
                "through identity/ScaledIdentity operators")
        return self.prox_diag(jnp.asarray(h), mu_diag)

    def prox_diag(self, h, mu_diag):
        h = _real_if_complex(h)
        v = -(h / mu_diag)
        vg = jnp.reshape(v, v.shape[:-1] + (self._ng, self._gs))
        # group threshold t_g = alpha / (2 mu_g); mu_diag may broadcast
        # from a scalar-per-block engine penalty
        mud = jnp.broadcast_to(mu_diag, v.shape)
        mug = jnp.reshape(mud, mud.shape[:-1] + (self._ng, self._gs))
        t = 0.5 * self._alpha / mug[..., 0]                  # (..., ng)
        nrm = jnp.sqrt(jnp.sum(vg * vg, axis=-1))            # (..., ng)
        # group zeroed when nrm <= t; guard the division with a
        # denominator representable in the TPU's f32-pair f64 emulation
        # (a 1e-300 floor flushes to zero there -> inf intermediates)
        scale = jnp.where(nrm > t, 1.0 - t / jnp.where(nrm > 0.0, nrm,
                                                       1.0), 0.0)
        return jnp.reshape(vg * scale[..., None], v.shape)


class HuberLoss(ObjectiveFunctionBase):
    """``F(x) = alpha * sum_i H_delta(x_i - y_i)`` with the Huber
    function ``H_delta(z) = z^2/2`` for ``|z| <= delta``, else
    ``delta(|z| - delta/2)`` (additive; no reference counterpart —
    robust data fits, see :func:`robust_regression_model`).

    The prox is elementwise and branch-free (three-way ``where`` on the
    VPU): with ``z = x - y``, ``u = h + mu y`` the quadratic region
    gives ``z = -2u/(alpha + 2 mu)`` and the linear tails
    ``z = -(2u ± alpha*delta)/(2 mu)`` — the robust generalization of
    the shifted-quadratic solve (reference ``objectivefunc.py:98-110``),
    degenerating to it as ``delta → ∞``.
    """

    needs_diagonal_mu = True
    batch_fields = ("alpha", "y")

    def _apply_updates(self, updates: dict) -> None:
        if "alpha" in updates:
            self._alpha = updates["alpha"]
        if "y" in updates:
            self._y = jnp.asarray(updates["y"])

    def __init__(self, alpha: float, y, delta: float = 1.0) -> None:
        y = jnp.asarray(y)
        assert y.ndim == 1
        super().__init__(y.shape[0])
        assert alpha > 0 and delta > 0
        self._alpha = alpha
        self._y = y
        self._delta = float(delta)

    def __call__(self, x) -> float:
        from ..ops.linop import _match_precision

        x = _real_if_complex(jnp.asarray(x))
        z = jnp.abs(x - _match_precision(_real_if_complex(self._y),
                                         x.dtype))
        d = self._delta
        val = self._alpha * jnp.sum(
            jnp.where(z <= d, 0.5 * z * z, d * (z - 0.5 * d)))
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            raise ValueError("h must not be None!")
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        from ..ops.linop import _match_precision

        h = _real_if_complex(h)
        # keep an f32 phase in f32 (stored _y is typically f64)
        y = _match_precision(_real_if_complex(self._y), h.dtype)
        a, d = self._alpha, self._delta
        u = h + mu_diag * y
        zq = -2.0 * u / (a + 2.0 * mu_diag)
        zp = -(2.0 * u + a * d) / (2.0 * mu_diag)
        zn = -(2.0 * u - a * d) / (2.0 * mu_diag)
        z = jnp.where(zq > d, zp, jnp.where(zq < -d, zn, zq))
        return y + z


class NuclearNormPenalty(ObjectiveFunctionBase):
    """``F(x) = alpha ||mat(x)||_*`` — the nuclear norm (sum of singular
    values) of ``x`` viewed as an (m, n) matrix, row-major (additive; no
    reference counterpart — extends the spectral-penalty family,
    reference ``objectivefunc.py:274-327``, to low-rank recovery and
    completes the classic robust-PCA model, :func:`rpca_model`).

    Prox is the singular-value soft-threshold via ONE batched SVD on the
    MXU (the spectral analogue of the reference's elementwise
    ``_softmax``, ``objectivefunc.py:335-355``):

        argmin_X  alpha ||X||_* + 2 Re<H, X> + mu |X|_F^2
                = U soft(s, alpha/(2 mu)) V^H,   U s V^H = svd(-H/mu).

    The closed form requires a uniform (scaled-identity) penalty, which
    identity couplings guarantee; the eager ``solve`` checks it on
    concrete values, the jit engine documents it as a contract.
    """

    needs_diagonal_mu = True
    batch_fields = ("alpha",)

    def _apply_updates(self, updates: dict) -> None:
        if "alpha" in updates:
            self._alpha = updates["alpha"]

    def __init__(self, alpha: float, shape: Sequence,
                 svd_method: str = "auto") -> None:
        assert alpha > 0
        assert svd_method in ("auto", "xla", "gram", "sign"), svd_method
        m, n = (int(s) for s in shape)
        super().__init__(m * n)
        self._alpha = alpha
        self._mn = (m, n)
        self._svd_method = svd_method
        # fully uniform penalty required; verified at ADMMPlan build
        self.uniform_mu_group = m * n

    def _svd(self, X):
        """Backend-aware thin SVD.

        ``auto``: XLA's SVD where it is exact and loop-friendly (CPU);
        on TPU, every real matrix uses the Gram-eigh route
        (:func:`~admmsolver_tpu.ops.linop.svd_via_gram`) — the axon
        backend's SVD is pathological in BOTH dtypes (f32 SIGABRTs the
        compiler, f64 is NaN-fragile and ~10x slower in-loop,
        ``benches/svd_tpu_probe.py``), and the Gram route is two MXU
        GEMMs plus an eigendecomposition (loop-body-safe Jacobi up to
        the :data:`~admmsolver_tpu.ops.prox.JACOBI_MAX_N` envelope,
        ``jnp.linalg.eigh`` above it).  Its ~sqrt(eps)·s_max floor on
        small singular values sits exactly in the soft-threshold's
        dead zone.
        """
        method = self._svd_method
        if method == "auto":
            method = ("gram" if (jax.default_backend() == "tpu"
                                 and not jnp.iscomplexobj(X))
                      else "xla")
        if method in ("gram", "sign"):
            # "sign" has no SVD (the prox uses the polar route); norm
            # evaluation falls back to the Gram singular values.
            from ..ops.linop import svd_via_gram

            return svd_via_gram(X)
        return jnp.linalg.svd(X, full_matrices=False)

    def __call__(self, x) -> float:
        X = jnp.reshape(x, x.shape[:-1] + self._mn)
        s = self._svd(X)[1]
        val = self._alpha * jnp.sum(s)
        return float(val) if not isinstance(val, jax.core.Tracer) else val

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        if h is None:
            raise ValueError("h must not be None!")
        if mu is None:
            raise ValueError("mu must not be None!")
        mu_diag = _mu_diagonal(mu)
        md = np.asarray(mu_diag)
        if md.ndim and not np.allclose(md, md.flat[0]):
            raise ValueError(
                "NuclearNormPenalty needs a uniform penalty (constant mu "
                "over the matrix); couple this block through identity/"
                "ScaledIdentity operators")
        return self.prox_diag(jnp.asarray(h), mu_diag)

    def prox_diag(self, h, mu_diag):
        h = _real_if_complex(h)
        v = -(h / mu_diag)
        X = jnp.reshape(v, v.shape[:-1] + self._mn)
        # per-lane scalar penalty (uniform by contract)
        mu0 = jnp.reshape(jnp.broadcast_to(mu_diag, v.shape),
                          v.shape)[..., 0]
        tau = 0.5 * self._alpha / mu0
        from ..ops.prox import _jacobi_boundary

        method = self._svd_method
        if method == "auto" and not jnp.iscomplexobj(X) \
                and jax.default_backend() == "tpu" \
                and min(self._mn) > _jacobi_boundary(X.dtype):
            # Above the Gram-Jacobi envelope the SVD-free polar route
            # wins: the sequential Jacobi rounds at n > 64 dominate the
            # iteration (BENCH_NOTES lesson 18's nuclear analogue), and
            # the soft-threshold annihilates exactly the polar
            # iteration's inaccurate small-singular-value subspace.
            method = "sign"
        if method == "sign":
            from ..ops.prox import svt_sign

            return jnp.reshape(svt_sign(X, tau), v.shape)
        U, s, Vh = self._svd(X)
        s2 = jnp.maximum(s - tau[..., None], 0.0)
        Xp = jnp.matmul(U * s2[..., None, :], Vh)
        return jnp.reshape(Xp, v.shape)


class SemiPositiveDefinitePenalty(ObjectiveFunctionBase):
    """Penalty for negative eigenvalues of x, viewed as a 3-way tensor with
    Hermitian slices along ``axis`` (reference ``objectivefunc.py:274-327``).

    The prox projects every slice onto the PSD cone using one batched
    ``eigh`` instead of the reference's Python slice loop.
    """

    needs_diagonal_mu = True

    def __init__(self, shape: Union[Sequence, np.ndarray], axis: int) -> None:
        assert len(shape) == 3
        super().__init__(int(np.prod(shape)))
        self._shape = tuple(int(s) for s in shape)
        self._axis = int(axis)

    def __call__(self, x) -> float:
        return 0.0

    def solve(self, h=None, mu: Optional[MatrixBase] = None):
        assert h is not None
        if mu is None:
            raise ValueError("mu must not be None!")
        return self.prox_diag(jnp.asarray(h), _mu_diagonal(mu))

    def prox_diag(self, h, mu_diag):
        h = _real_if_complex(h)
        return psd_project(-(h / mu_diag), self._shape, self._axis)
