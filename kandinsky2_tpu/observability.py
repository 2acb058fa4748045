"""Tracing, per-stage timing, scan-safe progress, and NaN/Inf guards.

The reference has no observability beyond tqdm bars (SURVEY §5).  Here:

* :func:`stage_timer` / :class:`StageReport` — wall-time per pipeline stage
  (prior / decoder / codec), with correct device-sync semantics (the tunneled
  TPU ignores ``block_until_ready``; a host transfer is the reliable fence).
* :func:`trace` — ``jax.profiler`` trace context for profile dumps.
* :func:`scan_progress` — a ``jax.debug.callback`` progress tick usable
  INSIDE ``lax.scan`` bodies without breaking compilation (reference tqdm
  loops live in Python, gaussian_diffusion.py:457-461).
* :func:`guard_finite` — debug-mode NaN/Inf check (jax.debug) for sampler
  states; zero-cost when disabled.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

GUARD_NANS = False  # flip on for debugging; adds host callbacks


def sync(x):
    """Reliable device fence: force a host transfer of one scalar."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(jax.device_get(jnp.ravel(leaf[0])[0]))
    return x


class StageReport:
    """Collects named wall-times; ``str(report)`` is the summary."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_to_sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result_to_sync is not None:
                sync(result_to_sync)
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def __str__(self):
        total = sum(self.times.values())
        lines = [
            f"  {k:<24} {v*1e3:9.1f} ms ({v/total*100:5.1f}%)"
            for k, v in self.times.items()
        ]
        return "\n".join(lines + [f"  {'total':<24} {total*1e3:9.1f} ms"])


@contextlib.contextmanager
def stage_timer(report: Optional[StageReport], name: str):
    if report is None:
        yield
        return
    with report.stage(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kandinsky2_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def scan_progress(pos, total: int, label: str = "step", every: int = 1):
    """Progress tick callable inside a scanned sampler step."""

    def _tick(p):
        p = int(p)
        if p % every == 0 or p == total - 1:
            print(f"\r{label} {p + 1}/{total}", end="", flush=True)

    jax.debug.callback(_tick, pos)


def guard_finite(x, name: str):
    """NaN/Inf guard: logs through jax.debug when GUARD_NANS is on."""
    if not GUARD_NANS:
        return x
    finite = jnp.isfinite(x.astype(jnp.float32)).all()
    jax.debug.callback(
        lambda ok: None if ok else print(f"!! non-finite values in {name}"),
        finite,
    )
    return x
