"""SO(3)/SE(3) exponential/log maps and rotation representations (pure jnp).

Behavior-parity targets (conventions, eps semantics) are the reference's
pytorch3d-derived implementations in `screw_se3/geo_utils.py` (reference
file:lines cited per function).  Everything here is branchless and safe under
`jax.jit` / `jax.vmap` / `jax.grad`.

Conventions:
  * Rotation matrices act on column vectors: `x' = R @ x`.
  * 4x4 rigid transforms are "column convention": ``[[R, t], [0, 1]]``.
  * `se3_exp_map` / `se3_log_map` keep the pytorch3d *row-vector* layout
    (input ``[log_translation | log_rotation]``, output transposed matrices
    with translation in the bottom row) purely for parity with the reference
    (geo_utils.py:147-222,452-522); new code should prefer `se3_exp_tw`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_ACOS_BOUND: float = 1.0 - 1e-4


# ---------------------------------------------------------------------------
# hat / vee
# ---------------------------------------------------------------------------

def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of 3-vectors. (geo_utils.py:56-87)

    v: (..., 3) -> (..., 3, 3) with rows [[0,-z,y],[z,0,-x],[-y,x,0]].
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def hat_inv(h: jnp.ndarray) -> jnp.ndarray:
    """Inverse hat operator: (..., 3, 3) skew matrix -> (..., 3) vector.

    (geo_utils.py:237-266; skew-symmetry is assumed, not checked, so the
    function stays jit-safe.)
    """
    return jnp.stack([h[..., 2, 1], h[..., 0, 2], h[..., 1, 0]], axis=-1)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def _so3_exp_terms(log_rot: jnp.ndarray, eps: float = 1e-4):
    """Rotation matrix + reusable intermediates. (geo_utils.py:90-117)

    Mirrors the reference's singularity handling exactly: the *squared* norm
    of the rotation log is clamped at `eps` before sqrt, so the effective
    minimum angle is sqrt(eps).
    """
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, min=eps))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = hat(log_rot)
    # K^2 = w w^T - ||w||^2 I, computed analytically: exact in f32 on the VPU
    # (a 3x3 MXU matmul would run at bf16 precision by default on TPU).
    skews_sq = (
        log_rot[..., :, None] * log_rot[..., None, :]
        - nrms[..., None, None] * jnp.eye(3, dtype=log_rot.dtype)
    )
    eye = jnp.eye(3, dtype=log_rot.dtype)
    r = fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye
    return r, rot_angles, skews, skews_sq


def so3_exp_map(log_rot: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3). (..., 3) -> (..., 3, 3)."""
    return _so3_exp_terms(log_rot, eps)[0]


def acos_linear_extrapolation(
    x: jnp.ndarray,
    bounds: tuple = (-DEFAULT_ACOS_BOUND, DEFAULT_ACOS_BOUND),
) -> jnp.ndarray:
    """arccos with linear extrapolation outside `bounds` for stable gradients.

    (geo_utils.py:282-350) — branchless select version.
    """
    lower, upper = bounds

    def _lin(xv, x0):
        dacos = -1.0 / math.sqrt(1.0 - x0 * x0)
        return (xv - x0) * dacos + math.acos(x0)

    x_mid = jnp.clip(x, lower, upper)
    acos_mid = jnp.arccos(x_mid)
    return jnp.where(
        x >= upper, _lin(x, upper), jnp.where(x <= lower, _lin(x, lower), acos_mid)
    )


def so3_rotation_angle(
    r: jnp.ndarray,
    eps: float = 1e-4,
    cos_angle: bool = False,
    cos_bound: float = 1e-4,
) -> jnp.ndarray:
    """Rotation angle from the matrix trace. (geo_utils.py:352-402)

    The reference raises on traces outside [-1-eps, 3+eps]; here invalid
    traces are simply clipped by the acos extrapolation (jit-safe).
    """
    rot_trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    if cos_bound > 0.0:
        bound = 1.0 - cos_bound
        return acos_linear_extrapolation(phi_cos, (-bound, bound))
    return jnp.arccos(phi_cos)


def so3_log_map(
    r: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4
) -> jnp.ndarray:
    """Log map SO(3) -> so(3). (geo_utils.py:405-449), branchless."""
    phi = so3_rotation_angle(r, cos_bound=cos_bound, eps=eps)
    phi_sin = jnp.sin(phi)
    ok = jnp.abs(phi_sin) > (0.5 * eps)
    safe_sin = jnp.where(ok, phi_sin, 1.0)
    phi_factor = jnp.where(ok, phi / (2.0 * safe_sin), 0.5 + (phi * phi) * (1.0 / 12))
    log_rot_hat = phi_factor[..., None, None] * (r - jnp.swapaxes(r, -1, -2))
    return hat_inv(log_rot_hat)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def _se3_v_matrix(
    log_rotation: jnp.ndarray,
    log_rotation_hat: jnp.ndarray,
    log_rotation_hat_square: jnp.ndarray,
    rotation_angles: jnp.ndarray,
) -> jnp.ndarray:
    """The "V" matrix of the SE(3) exponential. (geo_utils.py:120-144)"""
    eye = jnp.eye(3, dtype=log_rotation.dtype)
    ang = rotation_angles
    fac1 = ((1.0 - jnp.cos(ang)) / (ang ** 2))[..., None, None]
    fac2 = ((ang - jnp.sin(ang)) / (ang ** 3))[..., None, None]
    return eye + log_rotation_hat * fac1 + log_rotation_hat_square * fac2


def se3_exp_tw(omega_theta: jnp.ndarray, v_theta: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """SE(3) exponential in column convention (the TPU-native workhorse).

    Args:
        omega_theta: (..., 3) rotation log (axis * angle).
        v_theta:     (..., 3) translation log.
    Returns:
        (..., 4, 4) transforms ``[[R, V v], [0, 1]]`` — algebraically equal to
        the reference's `transform_from_exponential_coordinates(cat(wθ, vθ))`
        (screw_utils.py:27-30 over geo_utils.py:147-222), without the double
        transpose round-trip.
    """
    r, rot_angles, skews, skews_sq = _so3_exp_terms(omega_theta, eps)
    v = _se3_v_matrix(omega_theta, skews, skews_sq, rot_angles)
    t = jnp.einsum("...ij,...j->...i", v, v_theta)
    return rt_to_transform(r, t)


def se3_exp_map(log_transform: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """pytorch3d-convention SE(3) exp. (geo_utils.py:147-222)

    Input (..., 6) = [log_translation | log_rotation]; output transposed
    (row-vector) matrices with the translation in the bottom row.
    """
    m = se3_exp_tw(log_transform[..., 3:], log_transform[..., :3], eps)
    return jnp.swapaxes(m, -1, -2)


def se3_log_map(
    transform: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4
) -> jnp.ndarray:
    """pytorch3d-convention SE(3) log. (geo_utils.py:452-522)

    Input: (..., 4, 4) row-vector-convention transforms (translation in the
    bottom row). Output (..., 6) = [log_translation | log_rotation].
    """
    r = jnp.swapaxes(transform[..., :3, :3], -1, -2)
    log_rotation = so3_log_map(r, eps=eps, cos_bound=cos_bound)
    t = transform[..., 3, :3]
    nrms = jnp.sum(log_rotation ** 2, axis=-1)
    rotation_angles = jnp.sqrt(jnp.clip(nrms, min=eps))
    lr_hat = hat(log_rotation)
    lr_hat_sq = (
        log_rotation[..., :, None] * log_rotation[..., None, :]
        - nrms[..., None, None] * jnp.eye(3, dtype=log_rotation.dtype)
    )
    v = _se3_v_matrix(log_rotation, lr_hat, lr_hat_sq, rotation_angles)
    log_translation = jnp.linalg.solve(v, t[..., None])[..., 0]
    return jnp.concatenate([log_translation, log_rotation], axis=-1)


def inverse_transformation(trans: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transforms analytically. (geo_utils.py:9-53)"""
    r = trans[..., :3, :3]
    t = trans[..., :3, 3:4]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -(r_inv @ t)
    return rt_to_transform(r_inv, t_inv[..., 0])


def rt_to_transform(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation (..., 3, 3) and translation (..., 3) into (..., 4, 4)."""
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def make_transform(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Alias matching the reference's `create_transformation`/`th_with_zeros`
    (utils/model_utils.py:12-30)."""
    return rt_to_transform(rotation, jnp.reshape(translation, translation.shape[:-2] + (3,))
                           if translation.shape[-1] == 1 else translation)


# ---------------------------------------------------------------------------
# rotation representations
# ---------------------------------------------------------------------------

def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with zero subgradient at x <= 0. (geo_utils.py:525-533)"""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4), real part first.

    Best-conditioned-candidate selection as in pytorch3d
    (geo_utils.py:536-587), with the argmax one-hot select done via
    `take_along_axis` (branchless).
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4): candidate i = desired quaternion * component i

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    sel = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )
    return sel[..., 0, :]


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternions (..., 4) -> axis-angle (..., 3). (geo_utils.py:590-616)"""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, 1.0, angles)
    ratio = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return quaternions[..., 1:] / ratio


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative. (geo_utils.py:619-629)"""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D rotation -> matrix via Gram-Schmidt. (geo_utils.py:632-651)"""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), min=1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.clip(jnp.linalg.norm(b2, axis=-1, keepdims=True), min=1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Drop the last row of the rotation matrix. (geo_utils.py:654-668)"""
    batch = matrix.shape[:-2]
    return matrix[..., :2, :].reshape(batch + (6,))
