"""Host-execution region for the tiny graph-stage computations.

The graph stage (denoise / merge / MST / build_graph / TED) runs a handful of
small tensor ops whose shapes change with the surviving part count P. On the
remote-compiled TPU backend every fresh P costs a full tunnel compile
(~30 s+), and each tiny dispatch pays ~30 ms relay latency — for work that
takes microseconds. `on_host()` pins the default device to the local CPU
backend for the region, so these ops compile and run locally; the heavy
per-iteration compute stays on the TPU.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def on_host():
    """Run the enclosed jnp/jit work on the local CPU backend."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # no separate cpu backend (already CPU-only)
        yield
        return
    with jax.default_device(cpu):
        yield


@contextlib.contextmanager
def on_device():
    """Escape hatch: run the enclosed work on the accelerator even inside an
    `on_host()` region (e.g. the one-off auction presolve that warm-starts
    the host JV in the energy metric). No-op when only a CPU exists."""
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        yield None
        return
    with jax.default_device(accel[0]):
        yield accel[0]


def to_accel(tree):
    """Move a pytree's array leaves to the accelerator (inverse of to_host).

    Arrays explicitly committed to the CPU (to_host output) force any jit
    consuming them to LOWER FOR CPU — a Pallas-kernel program would then fail
    with "Only interpret mode is supported on CPU backend". Re-commit before
    feeding fit(). No-op when only a CPU exists."""
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(x, accel[0]) if hasattr(x, "dtype") else x,
        tree,
    )


def to_host(tree):
    """Move a pytree's array leaves to the local CPU backend.

    jit outputs are COMMITTED to the device they ran on, so inside an
    `on_host()` region a computation over fit-produced arrays would still
    dispatch back to the TPU; re-commit them to CPU first. Non-array leaves
    pass through untouched."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(x, cpu) if hasattr(x, "dtype") else x, tree
    )
