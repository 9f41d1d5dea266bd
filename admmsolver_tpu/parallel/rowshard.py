"""Large-N operator sharding: one problem instance across the mesh.

The instance-batch axis (``parallel.batch`` / ``parallel.mesh``) scales
*many* problems; this module scales ONE problem whose dense operator no
longer fits a chip — SURVEY.md §5's "long-context analogue": shard the
big axes of ``A`` over the device mesh with ``shard_map`` and accumulate
the reductions with ``psum`` (structure-exploitation counterpart of
``/root/reference/src/admmsolver/matrix.py:301-401``, which avoids
materializing big operators by algebra rather than by distribution).

Two pieces:

* :func:`sharded_gram` — setup-time ``A†A`` / ``A†y`` for a row-sharded
  (tall) ``A``: each device contracts its row block, one ``psum``
  produces the replicated Gram.  HBM per chip: ``M/d × N`` instead of
  ``M × N``.
* :class:`LargeNTwoBlockSolver` — a full 2-block identity-coupled solve
  (LeastSquares + L1/NonNegative, the flagship family) with the
  *feature* axis ``N`` sharded: state ``x0/x1/h`` and the thin spectral
  basis ``U`` (N, R) live in ``N/d``-row shards; each iteration needs
  exactly TWO collectives — ``psum(U_s† v_s)`` for the spectral solve
  and ``psum`` of the residual square-norms for the convergence/penalty
  decision (replicated, so every device takes the same branch —
  SURVEY.md §7 hard part #6).  Iteration math identical to the engine's
  2-block sweep (oracle-tested against ``SimpleOptimizer`` in
  ``tests/test_rowshard.py``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["sharded_gram", "LargeNTwoBlockSolver", "LargeNResult"]


def sharded_gram(A, y, mesh: Mesh, axis_name: Optional[str] = None):
    """(A†A, A†y) for a tall ``A`` row-sharded over the mesh.

    ``A``: (M, N) array (host or device); rows are scattered over the
    mesh's first axis, each device computes its block's contribution,
    and one ``psum`` replicates the (N, N) Gram and (N,) rhs.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    M = A.shape[0]
    assert M % ndev == 0, (
        f"rows {M} must divide the mesh size {ndev}; pad A/y with zero "
        "rows (zero rows contribute nothing to A†A or A†y)")

    def local(a_s, y_s):
        g = jax.lax.psum(a_s.conj().T @ a_s, axis_name)
        r = jax.lax.psum(a_s.conj().T @ y_s, axis_name)
        return g, r

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(axis_name, None), P(axis_name)),
                  out_specs=(P(None, None), P(None)))
    A = jax.device_put(jnp.asarray(A),
                       NamedSharding(mesh, P(axis_name, None)))
    y = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P(axis_name)))
    return f(A, y)


@dataclasses.dataclass
class LargeNResult:
    x0: jnp.ndarray          # (N,) sharded over the mesh
    x1: jnp.ndarray
    h: jnp.ndarray
    mu: jnp.ndarray          # scalar
    iterations: int
    converged: bool
    primal_residual: jnp.ndarray  # (niter,) NaN-padded
    dual_residual: jnp.ndarray


class LargeNTwoBlockSolver:
    """One huge-N 2-block problem (LS + L1/NonNeg, identity-coupled)
    sharded over the feature axis.

    ``A`` (M, N) with M < N (the compressed-sensing shape): the thin
    spectral basis ``U = A† W σ^{-1}`` (N, R) is built with each device
    holding its N-rows block, so no device ever materializes an (N, N)
    Gram or basis.  All per-iteration elementwise math is local; the two
    spectral GEMMs contract the sharded axis via ``psum``.
    """

    def __init__(self, A, mesh: Mesh, prox: str = "l1",
                 alpha_ls: float = 1.0, alpha1: float = 0.1,
                 axis_name: Optional[str] = None) -> None:
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        ndev = mesh.devices.size
        A = np.asarray(A)
        M, N = A.shape
        assert M < N, "large-N path expects a wide A (thin basis)"
        assert N % ndev == 0, (
            f"N={N} must divide the mesh size {ndev}; pad the problem")
        assert prox in ("l1", "nonneg")
        self.prox = prox
        self.alpha_ls = float(alpha_ls)
        self.alpha1 = float(alpha1)
        self.N, self.M = N, M

        # Thin eigensystem from the SMALL (M, M) Gram — the only dense
        # object that must fit one chip.  U's N-axis is sharded.
        AAc = A @ A.conj().T
        lam, W = np.linalg.eigh(AAc)
        tol = M * np.finfo(lam.dtype).eps * max(lam.max(initial=0.0), 0.0)
        keep = lam > tol
        lam, W = lam[keep], W[:, keep]
        U = (A.conj().T @ W) / np.sqrt(lam)          # (N, R)
        self.lam = jnp.asarray(lam)
        shard_n = NamedSharding(mesh, P(self.axis))
        self.U = jax.device_put(jnp.asarray(U),
                                NamedSharding(mesh, P(self.axis, None)))
        self.Ac = jax.device_put(jnp.asarray(A.conj().T),
                                 NamedSharding(mesh, P(self.axis, None)))
        self._shard_n = shard_n

    def _compiled(self, niter: int, interval: int):
        cache = getattr(self, "_cache", None)
        if cache is None:
            cache = self._cache = {}
        if (niter, interval) in cache:
            return cache[(niter, interval)]
        axis = self.axis
        lam = self.lam
        alpha, alpha1, prox = self.alpha_ls, self.alpha1, self.prox

        def run_local(U_s, acy_s, x0_s, x1_s, h_s, mu0, tols):
            """Per-device N-shard of the full solve loop.  Math = the
            engine's 2-block sweep (ADMMPlan for [(1,0,I,I)]), thin-
            spectral form; collectives: psum of the R-dim projection and
            of the residual square-norms (so every device takes the same
            loop-exit and penalty branches)."""
            rtol, atol = tols
            rdtype = lam.dtype
            pbuf = jnp.full(niter, jnp.nan, dtype=rdtype)
            dbuf = jnp.full(niter, jnp.nan, dtype=rdtype)

            def step(carry):
                it, x0, x1, h, mu, done, pb, db = carry
                v = alpha * acy_s + h + mu * x1
                w = jax.lax.psum(U_s.T @ v, axis)
                coef = 1.0 / (alpha * lam + mu) - 1.0 / mu
                x0n = U_s @ (coef * w) + v / mu
                z = x0n - h / mu
                if prox == "l1":
                    thr = 0.5 * alpha1 / mu
                    x1n = jnp.sign(z) * jnp.maximum(jnp.abs(z) - thr,
                                                    0.0)
                else:
                    x1n = jnp.maximum(z, 0.0)
                hn = h + mu * (x1n - x0n)

                sq = lambda a: jax.lax.psum(jnp.sum(a * a), axis)
                pn = jnp.sqrt(sq(x0n - x1n))
                dn = mu * jnp.sqrt(sq(x0n - x0))
                n0, n1 = jnp.sqrt(sq(x0n)), jnp.sqrt(sq(x1n))
                n0p = jnp.sqrt(sq(x0))
                conv = ((pn / jnp.maximum(n0, n1) < rtol) &
                        (dn / (mu * jnp.maximum(n0, n0p)) < rtol))
                conv = conv | ((pn < atol) & (dn < atol))
                pb = pb.at[it].set(pn)
                db = db.at[it].set(dn)

                # penalty update on the reference schedule
                is_b = (it % interval) == 0
                do_mu = is_b & jnp.logical_not(conv)
                mu_n = jnp.where(pn > 10.0 * dn, mu * 2.0, mu)
                mu_n = jnp.where(dn > 10.0 * pn, mu_n / 2.0, mu_n)
                mu_n = jnp.minimum(mu_n, 1e3)
                mu = jnp.where(do_mu, mu_n, mu)
                return (it + 1, x0n, x1n, hn, mu, conv, pb, db)

            def cond(carry):
                it, *_, done, pb, db = carry
                return (it < niter) & jnp.logical_not(done)

            carry = (jnp.array(0, jnp.int32), x0_s, x1_s, h_s,
                     jnp.asarray(mu0, lam.dtype), jnp.array(False),
                     pbuf, dbuf)
            it, x0, x1, h, mu, done, pb, db = jax.lax.while_loop(
                cond, step, carry)
            return x0, x1, h, mu, it, done, pb, db

        ax = self.axis
        f = shard_map(
            run_local, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax), P(ax), P(ax), P(ax),
                      P(), P()),
            out_specs=(P(ax), P(ax), P(ax), P(), P(), P(), P(), P()))
        cache[(niter, interval)] = jax.jit(f)
        return cache[(niter, interval)]

    def solve(self, y, niter: int = 10000, mu0: float = 1.0,
              rtol: float = 1e-12, atol: float = 0.0,
              interval_update_mu: int = 100) -> LargeNResult:
        y = jnp.asarray(y)
        acy = self.Ac @ y                       # sharded (N,)
        z = jnp.zeros(self.N, dtype=acy.dtype)
        z = jax.device_put(z, self._shard_n)
        run = self._compiled(int(niter), int(interval_update_mu))
        x0, x1, h, mu, it, done, pb, db = run(
            self.U, acy, z, z, z, jnp.asarray(float(mu0)),
            (rtol, atol))
        n = int(it)
        return LargeNResult(
            x0=x0, x1=x1, h=h, mu=mu, iterations=n,
            converged=bool(done),
            primal_residual=pb, dual_residual=db)
