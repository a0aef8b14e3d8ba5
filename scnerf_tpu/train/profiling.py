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
- :func:`hlo_stats_rows` / :func:`roofline_summary` — parse an xprof
  ``hlo_stats`` table out of a captured trace and integrate measured
  FLOPs / HBM bytes / bound-by attribution over op SELF time. Unlike
  ``compiled.cost_analysis()`` (which counts a ``lax.scan`` body ONCE),
  this counts every scan trip and remat recompute — it is the ground
  truth the r3 profile used to overturn the "HBM-bound" conclusion.
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


def hlo_stats_rows(logdir: str):
    """Parse the newest ``*.xplane.pb`` under ``logdir`` into the xprof
    ``hlo_stats`` table. Returns ``(cols, rows)`` where ``cols`` is the
    column-label list and ``rows`` is a list of value lists; returns
    ``(None, None)`` when no trace or no xprof converter is available."""
    import glob
    import json as _json
    import os

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return None, None
    try:
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    except Exception:
        return None, None
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        tbl = _json.loads(data)
    except Exception:
        return None, None
    if not (isinstance(tbl, dict) and "rows" in tbl):
        return None, None
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
    rows = [[(cell or {}).get("v") for cell in r["c"]] for r in tbl["rows"]]
    return cols, rows


def roofline_summary(cols, rows, n_steps: int) -> dict:
    """Measured per-step roofline numbers from an ``hlo_stats`` table.

    Integrates each op's model-FLOP rate and HBM bandwidth over its
    SELF time (a ``while`` op's total time includes its body, whose
    fusions are separate rows — self time avoids double counting), and
    buckets self time by xprof's per-op "Bound by" verdict."""

    def find(*cands):
        for cand in cands:
            for i, c in enumerate(cols):
                if c and cand in c.lower():
                    return i
        return None

    i_time = find("total self time (us)", "total time (us)")
    if i_time is None:
        return {}
    i_bound = find("bound by")
    i_gflops = find("model gflop/s")
    i_hbm = find("hbm bw")
    total_us = sum(float(r[i_time] or 0) for r in rows)
    out = {"device_us_per_step": total_us / n_steps}
    if i_bound is not None and total_us > 0:
        by_bound: dict = {}
        for r in rows:
            b = str(r[i_bound] or "?")
            by_bound[b] = by_bound.get(b, 0.0) + float(r[i_time] or 0)
        out["bound_by_pct"] = {
            b: round(100.0 * t / total_us, 1)
            for b, t in sorted(by_bound.items(), key=lambda kv: -kv[1])
        }
    if i_gflops is not None:
        flops = sum(float(r[i_gflops] or 0) * 1e9 * float(r[i_time] or 0) * 1e-6
                    for r in rows)
        out["measured_flops_per_step"] = flops / n_steps
    if i_hbm is not None:
        byts = sum(float(r[i_hbm] or 0) * (1 << 30) * float(r[i_time] or 0) * 1e-6
                   for r in rows)
        out["measured_hbm_bytes_per_step"] = byts / n_steps
    return out


def measure_roofline(run_steps, n_steps: int = 10, logdir: str | None = None) -> dict:
    """Capture a trace of ``run_steps(n_steps)`` and return
    :func:`roofline_summary` numbers (empty dict if tracing/parsing is
    unavailable — callers treat the measurement as best-effort)."""
    import tempfile

    ctx = contextlib.nullcontext(logdir) if logdir else tempfile.TemporaryDirectory()
    with ctx as d:
        try:
            with trace(d):
                run_steps(n_steps)
        except Exception:
            return {}
        cols, rows = hlo_stats_rows(d)
    if cols is None:
        return {}
    return roofline_summary(cols, rows, n_steps)
