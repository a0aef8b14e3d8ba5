"""NDC ray warp for forward-facing (LLFF) scenes.

Rebuild of ``/root/reference/NeRF/render.py:357-396``. One function covers both
the fixed-focal and the learned-camera variants (fx == fy == focal reduces to
the former).
"""
from __future__ import annotations

import jax.numpy as jnp


def ndc_rays(H: int, W: int, focal_x, focal_y, near, rays_o, rays_d):
    """Warp rays into NDC space.

    Args:
      H, W: image size (static).
      focal_x, focal_y: focal lengths; scalars (may be traced — learned K).
      near: near-plane distance (typically 1.0).
      rays_o, rays_d: ``(..., 3)``.
    Returns:
      (rays_o_ndc, rays_d_ndc), both ``(..., 3)``.
    """
    # Shift origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * focal_x)) * ox / oz
    o1 = -1.0 / (H / (2.0 * focal_y)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (W / (2.0 * focal_x)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * focal_y)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
