"""Tracing / profiling / numerics-debugging — first-class, unlike the
reference (SURVEY.md section 5: the reference has only wall-clock prints;
its only numerics guards are ``set_detect_anomaly`` and a NaN print scan).

- :class:`StepTimer` — wall-clock per-step timing with warmup skip and
  percentile summary (the ``iter_time`` logs, done right).
- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory of device timelines.
- :func:`debug_nans` — scoped ``jax_debug_nans`` (the reference's
  ``torch.autograd.set_detect_anomaly`` analogue, but scoped instead of a
  global import side effect).
- :func:`check_finite_tree` — host-side NaN/Inf scan over a pytree
  (replaces ``render.py:296-298``) returning offending leaf names.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite_tree(tree, prefix: str = "") -> list[str]:
    """Names of leaves containing NaN/Inf (empty list = clean)."""
    bad = []

    def name(path):
        parts = []
        for p in path:
            for attr in ("name", "key", "idx"):
                if hasattr(p, attr):
                    parts.append(str(getattr(p, attr)))
                    break
        return prefix + ".".join(parts)

    def visit(path, leaf):
        try:
            arr = np.asarray(leaf)
        except Exception:
            return
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(name(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad
