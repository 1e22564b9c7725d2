"""Temperature / learning-rate schedules."""

from __future__ import annotations

import jax.numpy as jnp


def tau_cosine(cur_iter, max_iter: int, end_temp: float, start_temp: float):
    """Cosine Gumbel-softmax temperature schedule, start -> end over max_iter.

    (reference utils/model_utils.py:33-37; called with cur_iter = i + 1,
    run_robot.py:157.) Accepts a traced array for `cur_iter`.
    """
    frac = jnp.asarray(cur_iter, dtype=jnp.float32) / max_iter
    return end_temp + (start_temp - end_temp) * (jnp.cos(jnp.pi * frac) + 1.0) * 0.5
