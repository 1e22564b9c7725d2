"""Screw parameters <-> SE(3) exponential coordinates (pure jnp).

Behavior-parity target: `screw_se3/screw_utils.py` in the reference.

The pipeline-critical trick preserved here (screw_utils.py:6-23 +
kinematic_utils.py:176-184): a joint's inactive coordinate is pinned to 1e-6
instead of 0, which keeps every frame in the `with_rot` branch (the no-rot
test is a *strict* `< eps` with eps = 1e-6), so h = d/θ stays finite and the
screw exponential produces the correct near-pure rotation / translation with
gradients flowing through both θ and d.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from reart_tpu.geometry.se3 import se3_exp_tw


def screw_param_to_exponential_coordinates(
    l: jnp.ndarray, m: jnp.ndarray, theta: jnp.ndarray, d: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """(l, m, θ, d) -> exponential coordinates ξθ = (ωθ | vθ), shape (..., 6).

    (screw_utils.py:6-23) With rotation: ω = l, v = (l × m) × l + (d/θ) l.
    Without rotation (|θ| < eps or |θ-π| < eps, strict): ω = 0, v = l.
    Branchless: the θ denominator is made safe where no_rot.
    """
    no_rot = jnp.logical_or(
        jnp.abs(theta) < eps, jnp.abs(theta - math.pi) < eps
    )
    with_rot = jnp.logical_not(no_rot)[..., None]
    q = jnp.cross(l, m)
    theta_safe = jnp.where(no_rot, 1.0, theta)
    h = (d / theta_safe)[..., None]
    v_rot = jnp.cross(q, l) + h * l
    w = jnp.where(with_rot, l, 0.0)
    v = jnp.where(with_rot, v_rot, l)
    screw_axis = jnp.concatenate([w, v], axis=-1)
    return screw_axis * theta[..., None]


def transform_from_exponential_coordinates(log_transform: jnp.ndarray) -> jnp.ndarray:
    """ξθ = (ωθ | vθ), shape (..., 6) -> (..., 4, 4) column-convention transform.

    Equals the reference's permute-wrapped `se3_exp_map` round trip
    (screw_utils.py:27-30) without the double transpose.
    """
    return se3_exp_tw(log_transform[..., :3], log_transform[..., 3:])


def screw_transform(
    l: jnp.ndarray, m: jnp.ndarray, theta: jnp.ndarray, d: jnp.ndarray
) -> jnp.ndarray:
    """Fused (l, m, θ, d) -> (..., 4, 4): the per-edge joint transform used by
    forward kinematics (one call instead of the reference's two)."""
    return transform_from_exponential_coordinates(
        screw_param_to_exponential_coordinates(l, m, theta, d)
    )
