"""Checkpoint / resume for ADMM solver state.

The reference has no persistence — optimizer state lives only in memory and
the only resume mechanism is the manual ``x0`` warm start
(``/root/reference/src/admmsolver/optimizer.py:141-163,146-149``).  Here the
carry state is a small pytree ``(x, h, mu, histories)``; we serialize it
with ``numpy.savez`` (no extra deps, works for both the single-instance
:class:`~admmsolver_tpu.optimizer.SimpleOptimizer` and batched
:class:`~admmsolver_tpu.parallel.batch.BatchResult` states) and restore
into a warm-started solver.  Long multi-host λ-sweeps can thus restart
mid-path after preemption.
"""
from __future__ import annotations

import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state", "restore_optimizer",
           "save_batch_result", "load_batch_result",
           "save_batch_result_local", "load_batch_result_scattered"]

_FORMAT_VERSION = 1


def save_state(path: str, opt) -> None:
    """Persist a :class:`SimpleOptimizer`'s resumable state."""
    arrays = {}
    for i, x_ in enumerate(opt._x):
        arrays[f"x_{i}"] = np.asarray(x_)
    for i, h_ in enumerate(opt._h):
        arrays[f"h_{i}"] = np.asarray(h_)
    arrays["mu"] = np.asarray(opt._mu)
    arrays["primal_residual"] = np.asarray(opt._primal_residual)
    arrays["dual_residual"] = np.asarray(opt._dual_residual)
    meta = {
        "version": _FORMAT_VERSION,
        "nblocks": len(opt._x),
        "npairs": len(opt._h),
        "max_mu": opt._max_mu,
    }
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_state(path: str) -> dict:
    """Load raw checkpoint contents."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta.get('version')}")
        out = {
            "meta": meta,
            "x": [z[f"x_{i}"] for i in range(meta["nblocks"])],
            "h": [z[f"h_{i}"] for i in range(meta["npairs"])],
            "mu": z["mu"],
            "primal_residual": z["primal_residual"].tolist(),
            "dual_residual": z["dual_residual"].tolist(),
        }
    return out


def restore_optimizer(path: str, model, dtype=None):
    """Rebuild a warm-started :class:`SimpleOptimizer` from a checkpoint.

    The model must match the checkpoint's block/pair structure (shapes are
    validated on restore).
    """
    from ..optimizer import SimpleOptimizer

    state = load_state(path)
    opt = SimpleOptimizer(model, x0=state["x"], max_mu=state["meta"]["max_mu"],
                          dtype=dtype)
    if len(state["h"]) != len(opt._h):
        raise ValueError(
            f"checkpoint has {len(state['h'])} dual blocks, model needs "
            f"{len(opt._h)}")
    for restored, expected in zip(state["h"], opt._h):
        if restored.shape != expected.shape:
            raise ValueError(
                f"dual shape mismatch: {restored.shape} vs {expected.shape}")
    opt._h = tuple(jnp.asarray(h_) for h_ in state["h"])
    opt._mu = jnp.asarray(state["mu"])
    opt._primal_residual = list(state["primal_residual"])
    opt._dual_residual = list(state["dual_residual"])
    return opt


def save_batch_result(path: str, res) -> None:
    """Persist a :class:`BatchResult` (e.g. to resume a λ-sweep via
    ``BatchedSolver.solve(x0=..., mu0=...)``)."""
    arrays = {}
    for i, x_ in enumerate(res.x):
        arrays[f"x_{i}"] = np.asarray(x_)
    for i, h_ in enumerate(res.h):
        arrays[f"h_{i}"] = np.asarray(h_)
    arrays["mu"] = np.asarray(res.mu)
    arrays["iterations"] = np.asarray(res.iterations)
    arrays["converged"] = np.asarray(res.converged)
    arrays["primal_residual"] = np.asarray(res.primal_residual)
    arrays["dual_residual"] = np.asarray(res.dual_residual)
    meta = {"version": _FORMAT_VERSION, "nblocks": len(res.x),
            "npairs": len(res.h)}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def _local_rows(a):
    """(rows, global_indices) of the batch-axis lanes addressable by this
    process.  Assumes batch-axis(-only) sharding, which is what
    :class:`~admmsolver_tpu.parallel.batch.BatchedSolver` produces; fully
    replicated / host arrays yield all lanes."""
    if not hasattr(a, "addressable_shards"):
        arr = np.asarray(a)
        return arr, np.arange(arr.shape[0])
    seen = {}
    for sh in a.addressable_shards:
        idx = sh.index
        sl = idx[0] if idx else slice(None)
        start = sl.start if sl.start is not None else 0
        if start in seen:
            continue  # replicas of the same global rows
        seen[start] = np.asarray(sh.data)
    starts = sorted(seen)
    rows = np.concatenate([seen[s] for s in starts], axis=0)
    gidx = np.concatenate(
        [np.arange(s, s + seen[s].shape[0]) for s in starts])
    return rows, gidx


def save_batch_result_local(path: str, res) -> None:
    """Persist only THIS PROCESS's addressable lanes of a (possibly
    sharded) :class:`BatchResult` — the multi-host checkpoint story
    promised in docs/SCALING.md: every process writes its own shard file
    (e.g. ``f"ckpt_p{jax.process_index()}.npz"``) with the global lane
    indices, with no cross-host gather and no host-0 memory spike.
    Reassemble with :func:`load_batch_result_scattered`."""
    arrays = {}
    gidx = None
    for i, x_ in enumerate(res.x):
        arrays[f"x_{i}"], gidx = _local_rows(x_)
    for i, h_ in enumerate(res.h):
        arrays[f"h_{i}"], _ = _local_rows(h_)
    for name in ("mu", "iterations", "converged",
                 "primal_residual", "dual_residual"):
        arrays[name], _ = _local_rows(getattr(res, name))
    arrays["lane_index"] = gidx
    meta = {"version": _FORMAT_VERSION, "nblocks": len(res.x),
            "npairs": len(res.h), "scattered": True}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_batch_result_scattered(paths):
    """Reassemble a :class:`BatchResult` from per-process shard files
    written by :func:`save_batch_result_local` (any order; lanes are
    sorted back into global order)."""
    from ..parallel.batch import BatchResult

    parts = []
    meta0 = None
    for path in paths:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            if meta.get("version") != _FORMAT_VERSION or \
                    not meta.get("scattered"):
                raise ValueError(f"{path} is not a scattered checkpoint "
                                 f"shard (meta={meta})")
            if meta0 is None:
                meta0 = meta
            parts.append({k: z[k] for k in z.files if k != "__meta__"})
    order = np.argsort(np.concatenate([p["lane_index"] for p in parts]))

    def cat(name):
        return np.concatenate([p[name] for p in parts], axis=0)[order]

    return BatchResult(
        x=tuple(jnp.asarray(cat(f"x_{i}"))
                for i in range(meta0["nblocks"])),
        h=tuple(jnp.asarray(cat(f"h_{i}"))
                for i in range(meta0["npairs"])),
        mu=jnp.asarray(cat("mu")),
        iterations=jnp.asarray(cat("iterations")),
        converged=jnp.asarray(cat("converged")),
        primal_residual=jnp.asarray(cat("primal_residual")),
        dual_residual=jnp.asarray(cat("dual_residual")),
    )


def load_batch_result(path: str):
    from ..parallel.batch import BatchResult

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta.get('version')}")
        return BatchResult(
            x=tuple(jnp.asarray(z[f"x_{i}"])
                    for i in range(meta["nblocks"])),
            h=tuple(jnp.asarray(z[f"h_{i}"])
                    for i in range(meta["npairs"])),
            mu=jnp.asarray(z["mu"]),
            iterations=jnp.asarray(z["iterations"]),
            converged=jnp.asarray(z["converged"]),
            primal_residual=jnp.asarray(z["primal_residual"]),
            dual_residual=jnp.asarray(z["dual_residual"]),
        )
