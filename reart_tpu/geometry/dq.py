"""Quaternion / dual-quaternion algebra and screw extraction (pure jnp).

Behavior-parity target: `screw_se3/dq_utils.py` in the reference. The critical
function is `dq_to_screw` (dq_utils.py:142-183): SE(3) -> Plücker axis (l, m),
rotation angle θ and slide d, with axis-sign canonicalization against
up=(1,1,1) and the identity-transform guard. The reference's boolean-mask
assignments are rewritten as `jnp.where` selects with singularity-safe
denominators so the whole thing is jit/vmap/grad-safe.

Quaternions are (w, x, y, z) (real part first). Dual quaternions are (..., 8)
= [real quat | dual quat].
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from reart_tpu.geometry.se3 import matrix_to_quaternion


def q_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (..., 4) quaternions. (dq_utils.py:65-83)"""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def q_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """(w, -x, -y, -z). (dq_utils.py:124-131)"""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def q_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions; zero-norm is clamped instead of asserted
    (dq_utils.py:113-121 asserts — here we stay jit-safe)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.clip(norm, min=eps)


def q_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of (..., 4) quaternions, shape (..., 1).

    θ = 2 atan2(||im||, re) — deliberately NOT wrapped to (-π, π]
    (dq_utils.py:98-110, including the "very careful" comment about wrap).
    """
    q = q_normalize(q)
    re, im = q[..., :1], q[..., 1:]
    norm = jnp.linalg.norm(im, axis=-1, keepdims=True)
    return 2.0 * jnp.arctan2(norm, re)


def dq_mul(dq1: jnp.ndarray, dq2: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion product. (dq_utils.py:11-26)"""
    r1, d1 = dq1[..., :4], dq1[..., 4:]
    r2, d2 = dq2[..., :4], dq2[..., 4:]
    return jnp.concatenate([q_mul(r1, r2), q_mul(r1, d2) + q_mul(d1, r2)], axis=-1)


def dq_translation(dq: jnp.ndarray) -> jnp.ndarray:
    """Translation of a unit dual quaternion: 2 q_d q_r*. (dq_utils.py:29-38)"""
    r, d = dq[..., :4], dq[..., 4:]
    return q_mul(2.0 * d, q_conjugate(r))[..., 1:]


def dq_normalize(dq: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Divide by the real-part norm. (dq_utils.py:41-50)"""
    norm = jnp.sqrt(jnp.sum(dq[..., :4] ** 2, axis=-1, keepdims=True))
    return dq / jnp.clip(norm, min=eps)


def dq_quaternion_conjugate(dq: jnp.ndarray) -> jnp.ndarray:
    """Element-wise quaternion conjugate of both parts. (dq_utils.py:53-62)"""
    conj = jnp.asarray([1, -1, -1, -1, 1, -1, -1, -1], dtype=dq.dtype)
    return dq * conj


def wrap_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-π, π], odd multiples of π go to +π. (dq_utils.py:86-95)"""
    pi = jnp.asarray(math.pi, dtype=theta.dtype)
    res = jnp.mod(theta + pi, 2.0 * pi) - pi
    return jnp.where(res == -pi, pi, res)


def transform_to_dq(t: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) rigid transform -> unit dual quaternion. (dq_utils.py:134-139)"""
    q_r = matrix_to_quaternion(t[..., :3, :3])
    trans_q = jnp.concatenate(
        [jnp.zeros_like(t[..., :1, 3]), t[..., :3, 3]], axis=-1
    )
    q_d = 0.5 * q_mul(trans_q, q_r)
    return jnp.concatenate([q_r, q_d], axis=-1)


def dq_to_screw(dq: jnp.ndarray, eps: float = 1e-6):
    """Screw parameters of a rigid transform. (dq_utils.py:142-183)

    Returns (l, m, theta, d): Plücker axis direction l (..., 3), moment
    m (..., 3), rotation angle theta (...,), slide d (...,).

    Semantics preserved from the reference, made branchless:
      * no_rot frames (|θ| < eps or |θ-π| < eps): axis from the translation
        direction, d = ||t||, θ pinned to eps;
      * axis-sign canonicalization against up = (1,1,1) flips (l, θ) and, for
        no_rot frames only, d;
      * identity transforms get l = (1, *, *) (x-component forced to 1, same
        partial write as the reference) — the axis is indeterminate there;
      * the reference's runtime warning for identity inputs is dropped
        (not representable under jit).
    """
    dq_r = dq[..., :4]
    theta = q_angle(dq_r)  # (..., 1), from the *normalized* real part
    theta_sq = theta[..., 0]
    no_rot = jnp.logical_or(
        jnp.abs(theta_sq) < eps, jnp.abs(theta_sq - math.pi) < eps
    )
    t = dq_translation(dq)

    # with_rot axis: imaginary part / sin(θ/2); safe denominator where no_rot.
    sin_half = jnp.sin(theta / 2.0)
    sin_half_safe = jnp.where(no_rot[..., None], 1.0, sin_half)
    l_rot = dq_r[..., 1:] / sin_half_safe

    # no_rot axis: translation direction; d = ||t||.
    t_norm = jnp.linalg.norm(t, axis=-1)
    l_no = t / (t_norm[..., None] + 1e-10)

    l = jnp.where(no_rot[..., None], l_no, l_rot)
    d = jnp.where(no_rot, t_norm, 0.0)

    # Canonicalize the axis sign against up = (1, 1, 1). (dq_utils.py:166-172)
    cos = jnp.sum(l, axis=-1, keepdims=True)
    flip = cos < 0
    theta = jnp.where(flip, -theta, theta)
    l = jnp.where(flip, -l, l)
    d = jnp.where(no_rot, jnp.where(flip[..., 0], -d, d), jnp.sum(t * l, axis=-1))

    # Identity transforms: axis indeterminate; force x-component to 1.
    no_trans = jnp.abs(d) <= 1e-8  # torch.isclose(d, 0) default tolerances
    unit_transform = jnp.logical_and(no_rot, no_trans)
    l = jnp.where(
        unit_transform[..., None],
        jnp.concatenate([jnp.ones_like(l[..., :1]), l[..., 1:]], axis=-1),
        l,
    )

    theta = jnp.where(no_rot[..., None], eps, theta)

    # Moment m = 1/2 (t × l + l × (t × l) / tan(θ/2)). (dq_utils.py:181-182)
    t_l_cross = jnp.cross(t, l)
    m = 0.5 * (t_l_cross + jnp.cross(l, t_l_cross / jnp.tan(theta / 2.0)))
    return l, m, theta[..., 0], d
