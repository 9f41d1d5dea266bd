"""Observability: profiling scopes, convergence diagnostics, NaN guards.

The reference's only observability is the residual history lists and a
per-iteration ``callback`` hook (``/root/reference/src/admmsolver/
optimizer.py:162-163,304,315-316``).  Here:

* :func:`trace` — context manager around ``jax.profiler`` for device
  traces of solve runs (view in TensorBoard / xprof).
* :func:`convergence_report` — post-hoc diagnostics from residual
  histories: iteration counts, stall detection (mu oscillation shows up
  as a non-decreasing residual plateau), non-finite detection.
* :func:`check_finite_state` — aborts on NaN/Inf solver state (the
  failure-detection hook for long unattended runs; SURVEY.md §5
  "failure detection").
"""
from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np

__all__ = ["trace", "convergence_report", "check_finite_state",
           "debug_nans", "timed_solve"]


def timed_solve(solve, *, instances: int = 1, warmup: bool = True,
                repeats: int = 1) -> dict:
    """Run ``solve()`` and emit a throughput record.

    ``solve`` returns a BatchResult-like object with ``.x`` (blocked on
    for accurate device timing) and ``.iterations``.  With ``warmup``,
    one unmeasured call absorbs compilation (identical-signature warmup,
    the only reliable pattern through slow remote compilers).  Returns
    ``{"seconds", "iterations_total", "instance_iters_per_s", "result"}``
    — the SURVEY §5 iterations/s emitter.
    """
    import time

    import jax

    if warmup:
        r = solve()
        jax.block_until_ready(r.x)
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        r = solve()
        jax.block_until_ready(r.x)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    iters = int(np.sum(np.asarray(r.iterations))) \
        if hasattr(r, "iterations") else None
    out = {"seconds": dt, "iterations_total": iters, "result": r}
    if iters:
        out["instance_iters_per_s"] = iters / dt
    return out


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Raise at the first NaN-producing op inside the scope (test-mode NaN
    debugging; SURVEY.md §5 'race detection / sanitizers' row)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a solve: ``with trace('/tmp/trace'): solver.solve(...)``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def convergence_report(primal, dual, rtol: Optional[float] = None) -> dict:
    """Diagnostics from residual histories (accepts the single-instance
    lists or one lane of a batched (niter,) buffer)."""
    primal = np.asarray(primal, dtype=float)
    dual = np.asarray(dual, dtype=float)
    mask = np.isfinite(primal)
    n = int(mask.sum())
    report = {
        "iterations": n,
        "finite": bool(np.isfinite(primal[mask]).all()
                       and np.isfinite(dual[:n]).all()),
        "final_primal": float(primal[mask][-1]) if n else None,
        "final_dual": float(dual[:n][-1]) if n else None,
    }
    if n >= 20:
        # stall: no order-of-magnitude progress over the last half
        half = primal[mask][n // 2:]
        report["stalled"] = bool(half.min() > 0 and
                                 half[-1] > 0.5 * half[0])
        report["reduction_rate"] = float(
            (np.log10(half[-1] + 1e-300) - np.log10(half[0] + 1e-300))
            / max(len(half) - 1, 1))
    else:
        report["stalled"] = False
        report["reduction_rate"] = None
    return report


def check_finite_state(opt) -> None:
    """Raise ``FloatingPointError`` when solver state went non-finite
    (call between ``solve()`` segments of long runs)."""
    for i, x_ in enumerate(opt.x):
        if not np.isfinite(np.asarray(x_)).all():
            raise FloatingPointError(
                f"non-finite primal state in block {i}; aborting (check "
                "problem conditioning / penalty bounds)")
    for i, h_ in enumerate(opt.h):
        if not np.isfinite(np.asarray(h_)).all():
            raise FloatingPointError(
                f"non-finite dual state for pair {i}; aborting")
