"""SO(3) parameterizations: 6D (Gram-Schmidt), axis-angle, Euler.

TPU-native rebuild of the reference's camera math
(``/root/reference/model/camera_utils.py:17-195``): batched, branch-free,
``vmap``/``jit``-friendly, differentiable end to end (the 6D->R map carries the
camera-extrinsics gradient for self-calibration).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS_MAG = 1e-8
_EPS_DIV = 1e-10


def ortho2rotation(poses: jnp.ndarray) -> jnp.ndarray:
    """6D continuous rotation representation -> rotation matrices.

    Gram-Schmidt on the two raw 3-vectors; columns of the result are
    (x, y, x×y). Matches ``camera_utils.py:78-133`` numerically (same clamps
    and epsilons) so calibrations are transferable.

    Args:
      poses: ``(..., 6)``.
    Returns:
      ``(..., 3, 3)`` rotation matrices.
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]

    def _normalize(v):
        mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        mag = jnp.maximum(mag, _EPS_MAG)
        return v / (mag + _EPS_DIV)

    x = _normalize(x_raw)
    # Project y_raw off x, then normalize.
    inner = jnp.sum(x * y_raw, axis=-1, keepdims=True)
    norm2 = jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), _EPS_MAG)
    y = _normalize(y_raw - (inner / (norm2 + _EPS_DIV)) * x)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)


def rotation2orth(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices ``(..., 3, 3)`` -> 6D rep (first two columns)."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def axis_angle_to_rotation(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, batched.

    Args:
      axis: ``(..., 3)`` unit axes.
      angle: ``(...,)`` or ``(..., 1)`` radians.
    Returns:
      ``(..., 3, 3)``.
    """
    angle = jnp.asarray(angle)
    if angle.ndim == axis.ndim:
        angle = angle[..., 0]
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    c1 = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    row0 = jnp.stack([x * x * c1 + ca, x * y * c1 - z * sa, z * x * c1 + y * sa], axis=-1)
    row1 = jnp.stack([x * y * c1 + z * sa, y * y * c1 + ca, y * z * c1 - x * sa], axis=-1)
    row2 = jnp.stack([z * x * c1 - y * sa, y * z * c1 + x * sa, z * z * c1 + ca], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_to_axis_angle(R: jnp.ndarray):
    """Inverse Rodrigues: ``(..., 3, 3)`` -> (unit axis ``(...,3)``, angle)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    angle = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    ax = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    norm = jnp.linalg.norm(ax, axis=-1, keepdims=True)
    ax = ax / jnp.maximum(norm, _EPS_MAG)
    return ax, angle


def euler_to_rotation(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles -> R, numerically identical to the reference's
    ``rot_from_angle`` (``camera_utils.py:140-175``).

    Note the reference stacks matrix ROWS on the last axis, which transposes
    each axis rotation — equivalent to negating the angles; preserved here
    for exact parity (its inverse ``angle_from_rot`` compensates by negating,
    so the pair round-trips).
    """
    euler = -euler
    ax, ay, az = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    zeros = jnp.zeros_like(ax)
    ones = jnp.ones_like(ax)
    RX = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, cx, -sx], -1),
            jnp.stack([zeros, sx, cx], -1),
        ],
        axis=-2,
    )
    RY = jnp.stack(
        [
            jnp.stack([cy, zeros, sy], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-sy, zeros, cy], -1),
        ],
        axis=-2,
    )
    RZ = jnp.stack(
        [
            jnp.stack([cz, -sz, zeros], -1),
            jnp.stack([sz, cz, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return RZ @ RY @ RX


def rotation_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`euler_to_rotation` (``angle_from_rot``,
    ``camera_utils.py:177-181``); ``euler_to_rotation(rotation_to_euler(R))``
    round-trips exactly."""
    x = -jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = -jnp.arctan2(-R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    z = -jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def embed_rotation_44(R: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3, 3)`` -> homogeneous ``(..., 4, 4)``."""
    batch = R.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_inverse(E: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transforms ``(..., 4, 4)`` without a linear solve."""
    R = E[..., :3, :3]
    t = E[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(E)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def intrinsic_param_to_K(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """``[fx, fy, cx, cy]`` -> 4x4 K (``camera_utils.py:191-195``)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    K = jnp.eye(4, dtype=intrinsics.dtype)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    return K


def K_inverse_3x3(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an upper-triangular pinhole K (3x3 or 4x4 input).

    Cheaper and better-conditioned than a generic solve; keeps the gradient
    path to fx/fy/cx/cy simple for XLA to fuse.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    inv = jnp.zeros((3, 3), dtype=K.dtype)
    inv = inv.at[0, 0].set(1.0 / fx)
    inv = inv.at[0, 1].set(-s / (fx * fy))
    inv = inv.at[0, 2].set((s * cy - cx * fy) / (fx * fy))
    inv = inv.at[1, 1].set(1.0 / fy)
    inv = inv.at[1, 2].set(-cy / fy)
    inv = inv.at[2, 2].set(1.0)
    return inv
