"""Tracing / profiling hooks (SURVEY §5: the reference has none; we provide
jax.profiler traces + per-phase wall-clock).

Usage:
    with phase_timer("fit"):           # prints + records wall-clock
        ...
    enable_trace("/tmp/trace")          # device trace for xprof/tensorboard
"""

from __future__ import annotations

import contextlib
import time

_PHASES: dict[str, float] = {}


@contextlib.contextmanager
def phase_timer(name: str, verbose: bool = True):
    """Wall-clock a pipeline phase; durations accumulate in `phase_report`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASES[name] = _PHASES.get(name, 0.0) + dt
        if verbose:
            print(f"[phase] {name}: {dt:.2f}s")


def phase_report() -> dict[str, float]:
    return dict(_PHASES)


def reset_phases() -> None:
    _PHASES.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a region (view with xprof / tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
