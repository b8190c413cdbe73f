"""Lightweight timers + JAX profiler hooks.

The reference has no tracing/profiling facility beyond progress bars
(SURVEY.md §5; ProgressLogging at solving/methods.jl:248-254). For a
production TPU framework, observability is first-class but cheap:

* :class:`Timings` / :func:`timed` — nestable wall-clock section timers
  with an aggregated report (host-side; ns overhead when disabled).
* :func:`trace` — context manager around ``jax.profiler`` emitting an
  XPlane trace viewable in TensorBoard/XProf, for kernel-level analysis.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so solver
  phases (chunk N, Newton, LU) show up as named spans inside device traces.

Enable timers globally with ``KINETICA_TPU_TIMINGS=1`` or per-scope via
``Timings.enable()``.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

from .logging import logger


class Timings:
    """Aggregated named wall-clock sections (thread-unsafe by design: the
    solve orchestration is single-threaded host code)."""

    _enabled = bool(os.environ.get("KINETICA_TPU_TIMINGS"))
    _totals: dict[str, float] = defaultdict(float)
    _counts: dict[str, int] = defaultdict(int)

    @classmethod
    def enable(cls, on: bool = True) -> None:
        cls._enabled = on

    @classmethod
    def enabled(cls) -> bool:
        return cls._enabled

    @classmethod
    def add(cls, name: str, dt: float) -> None:
        cls._totals[name] += dt
        cls._counts[name] += 1

    @classmethod
    def reset(cls) -> None:
        cls._totals.clear()
        cls._counts.clear()

    @classmethod
    def report(cls, log: bool = True) -> dict[str, dict[str, float]]:
        out = {k: {"total_s": cls._totals[k], "count": cls._counts[k],
                   "mean_s": cls._totals[k] / max(cls._counts[k], 1)}
               for k in sorted(cls._totals)}
        if log and out:
            logger.info("--- kinetica_tpu timings ---")
            for k, v in out.items():
                logger.info("  %-32s %9.3fs total  %6d calls  %9.4fs mean",
                            k, v["total_s"], v["count"], v["mean_s"])
        return out


@contextlib.contextmanager
def timed(name: str):
    """Time a section into :class:`Timings` (no-op when disabled)."""
    if not Timings.enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        Timings.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def annotate(name: str):
    """Named span inside a device profile (jax.profiler.TraceAnnotation)."""
    import jax.profiler
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(logdir: str, with_host: bool = True):
    """Capture a jax/XLA device trace into ``logdir`` (XProf/TensorBoard).

    Usage::

        with trace("/tmp/jax-trace"):
            res = solve_network(method, sd, rd)
    """
    import jax.profiler
    jax.profiler.start_trace(logdir, create_perfetto_link=False,
                             create_perfetto_trace=with_host)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", logdir)
