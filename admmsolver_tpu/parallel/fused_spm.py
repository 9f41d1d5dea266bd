"""Fused fast path for the 3-block SpM family.

Drives :func:`admmsolver_tpu.ops.kernels.fused_spm_chunk`: per chunk the
Pallas kernel runs ``interval_update_mu`` iterations with all per-lane
state VMEM-resident; between chunks an XLA step computes the pair
residuals, the convergence predicate, the residual-balancing penalty
update (reference ``optimizer.py:277-299``), and the refreshed per-lane
affine factor — the reference's hash-keyed cache as a static schedule,
at chunk granularity like :class:`FusedTwoBlockSolver`.

Scope: ``Model([ConstrainedLeastSquares-or-LeastSquares, L1Regularizer,
NonNegativePenalty], [(0, 1, I, I), (0, 2, P, I)])`` — the reference's
flagship SpM analytic-continuation workload (``notebooks/spm.ipynb``
cells 10-11) — in float32.  The constrained prox is folded into a
per-lane affine map at factor time:

    x0 = b2 - M hk0,  M = (I - xi2 S^{-1} C) B,  B = (a A†A + mu_op)^{-1}
    b2 = a M A†y + xi2 S^{-1} D

algebraically identical to the engine's block elimination (reference
``objectivefunc.py:138-157``); a plain LeastSquares block is the special
case M = B, b2 = a B A†y.  Everything else uses
:class:`~admmsolver_tpu.parallel.batch.BatchedSolver`.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.objectivefunc import (ConstrainedLeastSquares, L1Regularizer,
                                    LeastSquares, NonNegativePenalty)
from ..models.problem import Model
from ..ops.kernels import fused_spm_chunk
from ..ops.linop import ScaledIdentityMatrix, _concrete, inv_hpd_schur
from .fused import _check_fused_overrides, _is_identity_si

__all__ = ["FusedSpMSolver", "FusedSpMResult"]


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedSpMResult:
    """Batch-major converged state (x: tuple of (B, n_k))."""

    x: tuple
    h: tuple
    mu: jnp.ndarray              # (B, 2), pair order [(1,0), (2,0)]
    iterations: jnp.ndarray
    converged: jnp.ndarray
    primal_residual: jnp.ndarray  # (B, nchunks) per-chunk samples
    dual_residual: jnp.ndarray


class FusedSpMSolver:
    """VMEM-resident fused solver for the SpM 3-block family."""

    def __init__(self, model: Model, tile_b: int = 256,
                 interpret: Optional[bool] = None) -> None:
        assert model.num_func == 3, "fused SpM path covers 3-block models"
        assert model.pairs == [(1, 0), (2, 0)], model.pairs
        f0, f1, f2 = model.functions
        if not isinstance(f0, LeastSquares):
            raise ValueError("block 0 must be (Constrained)LeastSquares")
        if not isinstance(f1, L1Regularizer):
            raise ValueError("block 1 must be L1Regularizer")
        if f1._offset is not None:
            raise ValueError(
                "fused SpM path does not support L1Regularizer offsets "
                "(the kernel applies the plain soft-threshold); use "
                "BatchedSolver")
        if not isinstance(f2, NonNegativePenalty):
            raise ValueError("block 2 must be NonNegativePenalty")
        if not (_is_identity_si(model.E[(1, 0)])
                and _is_identity_si(model.E[(0, 1)])
                and _is_identity_si(model.E[(0, 2)])):
            raise ValueError("couplings must be (0,1,I,I), (0,2,P,I)")
        P = _concrete(model.E[(2, 0)].asmatrix())
        AcA = _concrete(f0._AcA.asmatrix())
        Ac = _concrete(f0._Ac.asmatrix())
        if P is None or AcA is None or Ac is None:
            raise ValueError("fused SpM path needs concrete operators")
        if np.iscomplexobj(P) or np.iscomplexobj(AcA):
            raise ValueError("fused SpM path is real-f32 only; realify "
                             "complex models first")

        self.model = model
        self.f0, self.f1 = f0, f1
        self.nl = f0.size_x
        self.nw = f2.size_x
        self.nl_pad = _pad8(self.nl)
        self.nw_pad = _pad8(self.nw)
        self.tile_b = int(tile_b)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)

        f32 = np.float32
        Ppad = np.zeros((self.nw_pad, self.nl_pad), f32)
        Ppad[:self.nw, :self.nl] = np.asarray(P, f32)
        self.P = jnp.asarray(Ppad)
        self.Pt = jnp.asarray(Ppad.T.copy())
        self.AcA = jnp.asarray(np.asarray(AcA, f32))
        self.Ac = jnp.asarray(np.asarray(Ac, f32))
        self.W = jnp.asarray(np.asarray(P, f32).T @ np.asarray(P, f32))

        self.is_cls = isinstance(f0, ConstrainedLeastSquares)
        if self.is_cls:
            C = _concrete(f0._C.asmatrix())
            D = _concrete(f0._D)
            if C is None or D is None:
                raise ValueError("constraint C/D must be concrete")
            self.C = jnp.asarray(np.asarray(C, f32))      # (nc, nl)
            self.D = jnp.asarray(np.asarray(D, f32))      # (nc,)
            self.nc = self.C.shape[0]

    # -- factor refresh (chunk boundaries) -----------------------------
    def _factors(self, mu1, mu2, alpha_ls, acy):
        """Per-lane affine factor (M, b2) in feature-major padded form.

        ``mu1``/``mu2``/``alpha_ls``: (B,); ``acy`` = A†y (B, nl).
        """
        nl, nl_pad = self.nl, self.nl_pad
        eye = jnp.eye(nl, dtype=jnp.float32)
        Mpen = (alpha_ls[:, None, None] * self.AcA[None]
                + mu1[:, None, None] * eye[None]
                + mu2[:, None, None] * self.W[None])
        Bf = inv_hpd_schur(Mpen)                        # (B, nl, nl)
        if self.is_cls:
            Ch = self.C.conj().T                        # (nl, nc)
            # per-lane small products as broadcast mul + reduce (VPU)
            xi2 = -jnp.sum(Bf[..., None] * Ch[None, None], axis=2)
            S = jnp.sum(self.C[None, :, :, None]
                        * xi2[:, None], axis=2)         # (B, nc, nc)
            Sinv = -inv_hpd_schur(-S)
            CB = jnp.sum(self.C[None, :, :, None]
                         * Bf[:, None], axis=2)         # (B, nc, nl)
            SinvCB = jnp.sum(Sinv[..., None] * CB[:, None], axis=2)
            M = Bf - jnp.sum(xi2[..., None] * SinvCB[:, None], axis=2)
            SinvD = jnp.sum(Sinv * self.D[None, None, :], axis=2)
            b2 = (alpha_ls[:, None]
                  * jnp.sum(M * acy[:, None, :], axis=2)
                  + jnp.sum(xi2 * SinvD[:, None], axis=2))
        else:
            M = Bf
            b2 = alpha_ls[:, None] * jnp.sum(M * acy[:, None, :], axis=2)
        B = M.shape[0]
        Mp = jnp.zeros((B, nl_pad, nl_pad), jnp.float32)
        Mp = Mp.at[:, :nl, :nl].set(M)
        b2p = jnp.zeros((B, nl_pad), jnp.float32).at[:, :nl].set(b2)
        # feature-major: (nl_pad^2, B) and (nl_pad, B)
        return (Mp.transpose(1, 2, 0).reshape(nl_pad * nl_pad, B),
                b2p.T)

    # -- one compiled full run -------------------------------------------
    def _chunk_step(self, n_iters: int):
        """Chunk step as a pure function: kernel iterations + residuals +
        penalty update + refactor decision.  Called inside ONE jitted
        run (dispatching chunks from Python costs a host round-trip per
        chunk — through a remote-compile tunnel that latency alone loses
        to the engine's single-dispatch while_loop)."""
        P, Pt = self.P, self.Pt
        tile_b, interpret = self.tile_b, self.interpret

        def norm_f(a):  # feature-major norms over the feature axis
            return jnp.linalg.norm(a, axis=0)

        def step(state, acy, alpha_ls, alpha1, tols, knobs, do_mu):
            x0, x1, x2, h10, h20, mu, done, count = state
            rtol, atol = tols
            fact_incr, th_change, max_mu = knobs
            mu1, mu2 = mu[:, 0], mu[:, 1]

            Mf, b2f = self._factors(mu1, mu2, alpha_ls, acy)
            scal = jnp.zeros((8, mu.shape[0]), jnp.float32)
            scal = scal.at[0].set(mu1).at[1].set(mu2)
            scal = scal.at[2].set(0.5 * alpha1 / mu1)

            x0n, x1n, x2n, h10n, h20n, x0p = fused_spm_chunk(
                Pt, P, Mf, b2f, scal, x0, x1, x2, h10, h20,
                n_iters=n_iters, tile_b=tile_b, interpret=interpret)
            act = jnp.logical_not(done)
            am = act[None, :]
            x0n = jnp.where(am, x0n, x0)
            x1n = jnp.where(am, x1n, x1)
            x2n = jnp.where(am, x2n, x2)
            h10n = jnp.where(am, h10n, h10)
            h20n = jnp.where(am, h20n, h20)
            x0p = jnp.where(am, x0p, x0)

            # pair residuals of the chunk's final iteration (engine
            # semantics; pairs (1,0) and (2,0))
            hi = jax.lax.Precision.HIGHEST
            Px0 = jnp.dot(P, x0n, precision=hi)
            Px0p = jnp.dot(P, x0p, precision=hi)
            pn1 = norm_f(x0n - x1n)
            dn1 = mu1 * norm_f(x0n - x0p)
            pn2 = norm_f(Px0 - x2n)
            dn2 = mu2 * norm_f(Px0 - Px0p)
            rp1 = pn1 / jnp.maximum(norm_f(x0n), norm_f(x1n))
            rd1 = dn1 / jnp.maximum(mu1 * norm_f(x0n),
                                    mu1 * norm_f(x0p))
            rp2 = pn2 / jnp.maximum(norm_f(Px0), norm_f(x2n))
            rd2 = dn2 / jnp.maximum(mu2 * norm_f(Px0),
                                    mu2 * norm_f(Px0p))
            conv = (rp1 < rtol) & (rd1 < rtol) & \
                   (rp2 < rtol) & (rd2 < rtol)
            pn, dn = pn1 + pn2, dn1 + dn2
            conv = conv | ((pn < atol) & (dn < atol))
            done_new = done | (act & conv)

            def balance(m, p, d):
                m2 = jnp.where(p > th_change * d, m * fact_incr, m)
                m2 = jnp.where(d > th_change * p, m2 / fact_incr, m2)
                return jnp.minimum(m2, max_mu)

            upd = do_mu & act & jnp.logical_not(done_new)
            mu_out = jnp.stack(
                [jnp.where(upd, balance(mu1, pn1, dn1), mu1),
                 jnp.where(upd, balance(mu2, pn2, dn2), mu2)], axis=1)

            count = count + act.astype(count.dtype) * n_iters
            state = (x0n, x1n, x2n, h10n, h20n, mu_out, done_new, count)
            return state, (pn, dn)

        return step

    def _compiled_run(self, niter: int, interval: int):
        cached = getattr(self, "_run_cache", None)
        if cached is None:
            cached = self._run_cache = {}
        key = (niter, interval)
        if key in cached:
            return cached[key]
        cached[key] = jax.jit(self._build_run(niter, interval))
        return cached[key]

    def _compiled_solve(self, niter: int, interval: int, Bp: int,
                        has_y: bool):
        """The WHOLE solve — A†y, chunk schedule, and the feature-major
        -> batch-major result layout — as one jitted call on a
        tile-PADDED batch.

        Motivation (benches/spm_boundary_probe.py, round 4): the
        marginal compute of a 100-iteration chunk is 1.8-2.7 ms and the
        factor/boundary work is ~free, yet the round-3 full 500-iter
        solve cost ~50 ms — about 80% of every solve was per-call fixed
        overhead: the ~25 ms dispatch (irreducible, lesson 9) plus a
        separately-dispatched host A†y GEMM, padding ops, and SIX
        result-trim slices.  Everything but the one dispatch and the
        (B, M) input transfer lives inside the program.

        Keyed on the tile-padded ``Bp``, NOT the raw batch size: every
        distinct B used to trigger a full recompile (minutes per
        signature through the axon tunnel, CLAUDE.md); the cheap B<->Bp
        pad/trim steps run as tiny separate programs, and only when
        B != Bp (:meth:`_pad_trim`).
        """
        cached = getattr(self, "_run_cache", None)
        if cached is None:
            cached = self._run_cache = {}
        key = ("solve", niter, interval, Bp, has_y)
        if key in cached:
            return cached[key]
        run = self._build_run(niter, interval)
        nl, nw = self.nl, self.nw
        acy0 = None if has_y else jnp.asarray(
            np.asarray(_concrete(self.f0._Acy), np.float32))

        def full(data, alpha_ls, alpha1, mu0, tols, knobs, done0):
            if has_y:
                hi = jax.lax.Precision.HIGHEST
                acy = jnp.dot(data, self.Ac.T, precision=hi)
            else:
                acy = jnp.broadcast_to(acy0, (Bp, nl))
            mu0v = jnp.full((Bp, 2), mu0, jnp.float32)
            state, pbuf, dbuf = run(acy, alpha_ls, alpha1, mu0v, tols,
                                    knobs, done0)
            x0, x1, x2, h10, h20, mu, done, count = state
            trim = lambda a, f: a[:f].T
            return ((trim(x0, nl), trim(x1, nl), trim(x2, nw)),
                    (trim(h10, nl), trim(h20, nw)),
                    mu, jnp.minimum(count, niter), done,
                    pbuf.T, dbuf.T)

        cached[key] = jax.jit(full)
        return cached[key]

    def _pad_trim(self, B: int, Bp: int):
        """Tiny jitted B->Bp input pad and Bp->B output trim programs
        (one extra dispatch each; only used when B != Bp).  Padding
        lanes start ``done`` and never iterate."""
        cached = getattr(self, "_run_cache", None)
        if cached is None:
            cached = self._run_cache = {}
        key = ("padtrim", B, Bp)
        if key in cached:
            return cached[key]

        def pad(data, alpha_ls, alpha1, d0):
            padb = lambda a: jnp.pad(
                a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1))
            d0p = jnp.concatenate([d0, jnp.ones(Bp - B, dtype=bool)])
            return padb(data), padb(alpha_ls), padb(alpha1), d0p

        def trim(out):
            return jax.tree_util.tree_map(lambda a: a[:B], out)

        cached[key] = (jax.jit(pad), jax.jit(trim))
        return cached[key]

    def _build_run(self, niter: int, interval: int):
        """Full solve (iteration-0 chunk -> while_loop of full chunks ->
        remainder chunk) as ONE traceable function with early exit
        (unjitted so :meth:`solve_mixed` can fuse it with the f64 engine
        polish in a single program)."""

        # chunk schedule (reference optimizer.py:319-320): iteration 0,
        # then full `interval` chunks, then a remainder; penalty updates
        # fire on chunks whose LAST global iteration index is a multiple
        # of `interval` (iteration 0 and every full chunk; a partial
        # remainder never is).
        nfull = (niter - 1) // interval
        nrem = (niter - 1) % interval
        nchunks = 1 + nfull + (1 if nrem else 0)
        step1 = self._chunk_step(1)
        stepI = self._chunk_step(interval) if nfull else None
        stepR = self._chunk_step(nrem) if nrem else None

        def run(acy, alpha_ls, alpha1, mu0v, tols, knobs, done0):
            B = mu0v.shape[0]
            zf = lambda f: jnp.zeros((f, B), jnp.float32)
            state = (zf(self.nl_pad), zf(self.nl_pad), zf(self.nw_pad),
                     zf(self.nl_pad), zf(self.nw_pad), mu0v,
                     done0, jnp.zeros(B, jnp.int32))
            pbuf = jnp.full((nchunks, B), jnp.nan, jnp.float32)
            dbuf = jnp.full((nchunks, B), jnp.nan, jnp.float32)

            state, (pn, dn) = step1(state, acy, alpha_ls, alpha1,
                                    tols, knobs, jnp.array(True))
            pbuf = pbuf.at[0].set(pn)
            dbuf = dbuf.at[0].set(dn)

            if nfull:
                def cond(c):
                    k, state, pb, db = c
                    return (k < nfull) & jnp.logical_not(
                        jnp.all(state[6]))

                def body(c):
                    k, state, pb, db = c
                    state, (pn, dn) = stepI(state, acy, alpha_ls,
                                            alpha1, tols, knobs,
                                            jnp.array(True))
                    pb = pb.at[1 + k].set(pn)
                    db = db.at[1 + k].set(dn)
                    return (k + 1, state, pb, db)

                _, state, pbuf, dbuf = jax.lax.while_loop(
                    cond, body,
                    (jnp.array(0, jnp.int32), state, pbuf, dbuf))
            if nrem:
                def last(c):
                    state, pb, db = c
                    state, (pn, dn) = stepR(state, acy, alpha_ls,
                                            alpha1, tols, knobs,
                                            jnp.array(False))
                    pb = pb.at[nchunks - 1].set(pn)
                    db = db.at[nchunks - 1].set(dn)
                    return (state, pb, db)

                state, pbuf, dbuf = jax.lax.cond(
                    jnp.all(state[6]), lambda c: c, last,
                    (state, pbuf, dbuf))
            return state, pbuf, dbuf

        return run

    def solve(self,
              overrides: Optional[Dict] = None,
              batch_size: Optional[int] = None,
              niter: int = 10000,
              mu0=1.0,
              interval_update_mu: int = 100,
              rtol: float = 1e-12,
              atol: float = 0.0,
              fact_incr: float = 2.0,
              th_change: float = 10.0,
              max_mu: float = 1e3,
              done0=None) -> FusedSpMResult:
        """Solve a batch; overrides ``{(0,'y'): (B, M), (0,'alpha'): (B,),
        (1,'alpha'): (B,)}`` subsets, as in BatchedSolver.  ``done0``:
        (B,) bool mask of lanes that start converged (scheduler
        convention, as in BatchedSolver.solve)."""
        overrides = dict(overrides or {})
        B = _check_fused_overrides(overrides, "FusedSpMSolver")
        if B is None:
            B = batch_size
        if B is None:
            raise ValueError("pass overrides or batch_size")

        def batched_scalar(key, default):
            if key in overrides:
                return jnp.asarray(overrides[key], dtype=jnp.float32)
            return jnp.full((B,), float(default), dtype=jnp.float32)

        ys = overrides.get((0, "y"))
        has_y = ys is not None
        # device-side cast: ys may already be device-resident (a numpy
        # round trip would pull it back through the tunnel, ~10 ms at
        # the BASELINE SpM scale — same rule as _solve_mixed_fused)
        data = (jnp.asarray(ys).astype(jnp.float32) if has_y
                else jnp.zeros((B, 1), jnp.float32))
        alpha_ls = batched_scalar((0, "alpha"), float(self.f0._alpha))
        alpha1 = batched_scalar((1, "alpha"), float(self.f1._alpha))
        tols = (jnp.float32(rtol), jnp.float32(atol))
        knobs = (jnp.float32(fact_incr), jnp.float32(th_change),
                 jnp.float32(max_mu))
        if done0 is None:
            d0 = jnp.zeros(B, dtype=bool)
        else:
            d0 = jnp.asarray(done0, dtype=bool)
            assert d0.shape == (B,), d0.shape

        Bp = ((B + self.tile_b - 1) // self.tile_b) * self.tile_b
        run = self._compiled_solve(int(niter), int(interval_update_mu),
                                   Bp, has_y)
        if Bp != B:
            pad, trim = self._pad_trim(B, Bp)
            data, alpha_ls, alpha1, d0 = pad(data, alpha_ls, alpha1, d0)
        out = run(
            data, alpha_ls, alpha1, jnp.float32(mu0), tols, knobs, d0)
        if Bp != B:
            out = trim(out)
        x, h, mu, count, done, pbuf, dbuf = out
        return FusedSpMResult(
            x=x, h=h, mu=mu, iterations=count, converged=done,
            primal_residual=pbuf, dual_residual=dbuf)

    def solve_mixed(self,
                    overrides: Optional[Dict] = None,
                    niter_low: int = 2000,
                    niter: int = 2000,
                    mu0=1.0,
                    low_atol: float = 1e-5,
                    fused: bool = True,
                    **kw):
        """Fused-f32 phase, then f64 engine polish from the warm state.

        The VMEM-resident kernel burns down the bulk of the iterations
        at f32 speed (~4x the f32 engine, ~25x the f64 engine); the
        handed-off primal/dual/penalty state carries the progress
        exactly, and the f64 :class:`BatchedSolver` phase finishes to
        reference precision.  Returns the phase-2 BatchResult with
        summed iteration counts.  Extra ``kw`` go to the f64 phase.

        ``fused=True`` (default) runs the kernel phase, the dtype
        promotion, and the engine polish inside ONE jit — the hand-off's
        second host dispatch (~30-40 ms, BENCH_NOTES lesson 9) was ~10%
        of the whole mixed solve at the BASELINE SpM scale.  Falls back
        to the two-dispatch driver for kwargs the fused path doesn't
        plumb (``x0``/``h0``/``dtype``).
        """
        from .batch import BatchedSolver, BatchResult

        bs = getattr(self, "_polish_solver", None)
        if bs is None:
            bs = self._polish_solver = BatchedSolver(
                self.model, dtype=jnp.float64)
        if fused and not (set(kw) - {
                "interval_update_mu", "update_h", "rtol", "atol",
                "fact_incr", "th_change", "max_mu", "record_residuals",
                "chunked_checks", "done0"}):
            return self._solve_mixed_fused(bs, overrides, niter_low,
                                           niter, mu0, low_atol, **kw)
        p1 = self.solve(overrides, niter=niter_low, mu0=mu0,
                        rtol=0.0, atol=low_atol,
                        done0=kw.get("done0"))
        x0 = tuple(jnp.asarray(a, jnp.float64) for a in p1.x)
        h0 = tuple(jnp.asarray(a, jnp.float64) for a in p1.h)
        p2 = bs.solve(overrides, x0=x0, h0=h0,
                      mu0=jnp.asarray(p1.mu, jnp.float64),
                      niter=niter, **kw)
        return BatchResult(
            x=p2.x, h=p2.h, mu=p2.mu,
            iterations=jnp.asarray(p1.iterations) + p2.iterations,
            converged=p2.converged,
            primal_residual=p2.primal_residual,
            dual_residual=p2.dual_residual)

    def _solve_mixed_fused(self, bs, overrides, niter_low, niter, mu0,
                           low_atol,
                           interval_update_mu: int = 100,
                           update_h: bool = True,
                           rtol: float = 1e-12,
                           atol: float = 0.0,
                           fact_incr: float = 2.0,
                           th_change: float = 10.0,
                           max_mu: float = 1e3,
                           record_residuals=True,
                           chunked_checks: bool = False,
                           done0=None):
        """One-jit kernel-phase + promotion + engine-polish composite
        (see :meth:`solve_mixed`)."""
        from ..config import ADMMConfig
        from .batch import (BatchResult, _cast_like,
                            _parse_record_residuals)

        overrides = dict(overrides or {})
        # The kernel phase only plumbs the fused-supported fields; an
        # engine-legal override like (0, 'A') would make the f32 phase
        # solve the TEMPLATE problem and warm-start the polish from the
        # wrong trajectory — reject it, mirroring FusedSpMSolver.solve.
        B = _check_fused_overrides(overrides, "FusedSpMSolver.solve_mixed")
        if B is None:
            raise ValueError("pass overrides with a leading batch axis")
        Bp = ((B + self.tile_b - 1) // self.tile_b) * self.tile_b

        # --- kernel-phase inputs (exactly as in :meth:`solve`) --------
        def batched_scalar(key, default):
            if key in overrides:
                a = jnp.asarray(overrides[key], dtype=jnp.float32)
            else:
                a = jnp.full((B,), float(default), dtype=jnp.float32)
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (Bp - B,))])
            return a

        ys = overrides.get((0, "y"))
        has_y = ys is not None
        if has_y:
            # A†y is computed INSIDE the composite (one MXU GEMM) — a
            # host-side numpy matmul here would force a device->host
            # round trip when ys is already device-resident.
            data = jnp.asarray(ys).astype(jnp.float32)
        else:
            data = jnp.broadcast_to(
                jnp.asarray(np.asarray(_concrete(self.f0._Acy),
                                       np.float32)), (B, self.nl))
        if Bp != B:
            data = jnp.concatenate(
                [data, jnp.broadcast_to(data[:1],
                                        (Bp - B, data.shape[1]))])
        alpha_ls = batched_scalar((0, "alpha"), float(self.f0._alpha))
        alpha1 = batched_scalar((1, "alpha"), float(self.f1._alpha))
        mu0v = jnp.full((Bp, 2), float(mu0), jnp.float32)
        tols_lo = (jnp.float32(0.0), jnp.float32(low_atol))
        knobs = (jnp.float32(fact_incr), jnp.float32(th_change),
                 jnp.float32(max_mu))
        if done0 is None:
            d0 = jnp.zeros(B, dtype=bool)
        else:
            d0 = jnp.asarray(done0, dtype=bool)
            assert d0.shape == (B,), d0.shape
        d0p = d0 if Bp == B else jnp.concatenate(
            [d0, jnp.ones(Bp - B, dtype=bool)])

        # --- engine-polish program ------------------------------------
        ov_hi = {k: _cast_like(jnp.float64, v)
                 for k, v in overrides.items()}
        ov_keys = tuple(sorted(ov_hi.keys()))
        ov_vals = tuple(jnp.asarray(ov_hi[k]) for k in ov_keys)
        cfg = ADMMConfig(niter=int(niter),
                         interval_update_mu=int(interval_update_mu),
                         update_h=bool(update_h), max_mu=float(max_mu),
                         fact_incr=float(fact_incr),
                         th_change=float(th_change))
        record, stride = _parse_record_residuals(record_residuals)

        cache = getattr(self, "_mixed_cache", None)
        if cache is None:
            cache = self._mixed_cache = {}
        ckey = (int(niter_low), cfg, ov_keys, record, stride,
                bool(chunked_checks), B, has_y)
        run_all = cache.get(ckey)
        if run_all is None:
            run_lo = self._build_run(int(niter_low),
                                     int(interval_update_mu))
            run_hi = bs._build(cfg, ov_keys, record,
                               bool(chunked_checks), stride)
            nl, nw = self.nl, self.nw

            def composite(data, alpha_ls, alpha1, mu0v, tols_lo, knobs,
                          ov_vals, tols_hi, d0p):
                if has_y:
                    acy = jnp.dot(data, self.Ac.T,
                                  precision=jax.lax.Precision.HIGHEST)
                else:
                    acy = data
                state, _, _ = run_lo(acy, alpha_ls, alpha1, mu0v,
                                     tols_lo, knobs, d0p)
                x0_, x1_, x2_, h10, h20, mu, done, count = state
                up = lambda a, f: a[:f, :B].T.astype(jnp.float64)
                x = (up(x0_, nl), up(x1_, nl), up(x2_, nw))
                h = (up(h10, nl), up(h20, nw))
                # Lanes the CALLER marked done skip the polish too; the
                # kernel phase's own (atol-gated) done flags do not.
                xh, hh, muh, doneh, c2, pb2, db2 = run_hi(
                    ov_vals, x, h, mu[:B].astype(jnp.float64), tols_hi,
                    d0p[:B])
                c1 = jnp.minimum(count[:B], niter_low)
                return xh, hh, muh, doneh, c1 + c2, pb2, db2

            run_all = cache[ckey] = jax.jit(composite)
        xh, hh, muh, done, count, pbuf, dbuf = run_all(
            data, alpha_ls, alpha1, mu0v, tols_lo, knobs, ov_vals,
            (rtol, atol), d0p)
        return BatchResult(x=xh, h=hh, mu=muh, iterations=count,
                           converged=done, primal_residual=pbuf,
                           dual_residual=dbuf)
