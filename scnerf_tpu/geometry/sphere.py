"""Unit-sphere geometry for NeRF++'s inverted-sphere background.

Rebuild of ``/root/reference/nerfplusplus/ddp_train_nerf.py:50-68``
(``intersect_sphere``) and ``/root/reference/nerfplusplus/ddp_model.py:16-45``
(``depth2pts_outside``). Fully batched, no data-dependent branching.
"""
from __future__ import annotations

import jax.numpy as jnp

TINY_NUMBER = 1e-6  # mirrors nerfplusplus/utils.py:7
HUGE_NUMBER = 1e10  # mirrors nerfplusplus/utils.py:8


def intersect_sphere(ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> jnp.ndarray:
    """Depth of the far intersection of each ray with the unit sphere.

    Assumes camera centers lie inside the unit sphere (the NeRF++ dataset
    normalization contract; the reference raises otherwise — we leave the
    check to the data loader so this stays jittable).

    Args:
      ray_o, ray_d: ``(..., 3)``.
    Returns:
      ``(...,)`` depth along (unnormalized) ``ray_d``.
    """
    d1 = -jnp.sum(ray_d * ray_o, axis=-1) / jnp.sum(ray_d * ray_d, axis=-1)
    p = ray_o + d1[..., None] * ray_d
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    p_norm_sq = jnp.sum(p * p, axis=-1)
    # sqrt argument is >= 0 when the midpoint is inside the sphere.
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_norm_sq, 0.0)) * ray_d_cos
    return d1 + d2


def depth2pts_outside(ray_o: jnp.ndarray, ray_d: jnp.ndarray, depth: jnp.ndarray):
    """Parameterize points beyond the unit sphere as ``(x', y', z', 1/r)``.

    ``depth`` is the *inverse distance* in ``[0, 1]``. Uses the Rodrigues
    rotation construction of the reference (``ddp_model.py:16-45``).

    Args:
      ray_o, ray_d: ``(..., 3)``.
      depth: ``(...,)``.
    Returns:
      (pts ``(..., 4)``, real_depth ``(...,)``).
    """
    d1 = -jnp.sum(ray_d * ray_o, axis=-1) / jnp.sum(ray_d * ray_d, axis=-1)
    p_mid = ray_o + d1[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_mid_norm * p_mid_norm, 0.0)) * ray_d_cos
    p_sphere = ray_o + (d1 + d2)[..., None] * ray_d

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.maximum(
        jnp.linalg.norm(rot_axis, axis=-1, keepdims=True), TINY_NUMBER
    )
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    rot_angle = (phi - theta)[..., None]

    cosr = jnp.cos(rot_angle)
    sinr = jnp.sin(rot_angle)
    p_new = (
        p_sphere * cosr
        + jnp.cross(rot_axis, p_sphere) * sinr
        + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1, keepdims=True) * (1.0 - cosr)
    )
    p_new = p_new / jnp.maximum(
        jnp.linalg.norm(p_new, axis=-1, keepdims=True), TINY_NUMBER
    )
    pts = jnp.concatenate([p_new, depth[..., None]], axis=-1)

    depth_real = 1.0 / (depth + TINY_NUMBER) * jnp.cos(theta) * ray_d_cos + d1
    return pts, depth_real
