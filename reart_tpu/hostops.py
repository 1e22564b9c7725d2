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
