"""Differentiable ray generation — jitted/vmapped replacement for the
reference's five ``get_rays*`` functions (``/root/reference/NeRF/get_rays.py``)
and ``render_ray_from_camera``
(``/root/reference/nerfplusplus/nerf_sample_ray_split.py:196-257``).

One pure function, :func:`pixels_to_rays`, handles both coordinate
conventions:

- ``opengl`` (NeRF): dirs = K^-1 [x, y, 1], then negate y and z
  (``get_rays.py:51,125``) — the OpenGL-style camera looking down -z.
- ``opencv`` (NeRF++): dirs = K^-1 [u+0.5, v+0.5, 1] with optional radial
  distortion applied to the pixels first (``nerf_sample_ray_split.py:227-232``).

Gradients flow from rays into every camera parameter (K, 6D rotation,
translation, distortion, noise grids) — the joint-calibration path of the
paper.
"""
from __future__ import annotations

import jax.numpy as jnp

from scnerf_tpu.camera.model import (
    OPENCV,
    OPENGL,
    Camera,
    get_distortion,
    get_extrinsic,
    get_intrinsic,
    ray_d_noise_at,
    ray_o_noise_at,
)
from scnerf_tpu.geometry.so3 import K_inverse_3x3

_EPS = 1e-10


def apply_radial_distortion(px, py, cx, cy, k1, k2):
    """NeRF++-style per-axis normalized radial warp
    (``nerf_sample_ray_split.py:227-232``): for each axis,
    ``p' = (p - c) * (1 + r^2 k1 + r^4 k2) + c`` with ``r = (p - c) / c``.
    """
    rx = (px - cx) / cx
    ry = (py - cy) / cy
    px = (px - cx) * (1.0 + rx**2 * k1 + rx**4 * k2) + cx
    py = (py - cy) * (1.0 + ry**2 * k1 + ry**4 * k2) + cy
    return px, py


def pixels_to_rays(
    camera: Camera,
    px: jnp.ndarray,
    py: jnp.ndarray,
    c2w: jnp.ndarray | None = None,
    image_idx=None,
    add_noise: bool = True,
):
    """Rays through pixels ``(px, py)`` of one (or per-ray many) camera(s).

    Args:
      camera: the learnable camera pytree.
      px, py: ``(M,)`` pixel coordinates (column, row). Integer pixel indices;
        the convention-specific center offset is added here.
      c2w: optional explicit camera-to-world ``(4, 4)`` or ``(M, 4, 4)``. If
        ``None``, decoded from the camera at ``image_idx``.
      image_idx: scalar or ``(M,)`` index into the camera's extrinsics table.
      add_noise: include the learnable ray o/d noise grids.

    Returns:
      (rays_o, rays_d): each ``(M, 3)``. ``rays_d`` is L2-normalized iff noise
      is enabled (matching the reference: noisy dirs are renormalized,
      noiseless dirs keep their K^-1 magnitude).
    """
    cfg = camera.config
    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    if c2w is None:
        c2w = get_extrinsic(camera, image_idx)
    K = get_intrinsic(camera)

    u = px + cfg.pixel_offset
    v = py + cfg.pixel_offset
    if cfg.convention == OPENCV and cfg.use_distortion:
        k = get_distortion(camera)
        u, v = apply_radial_distortion(u, v, K[0, 2], K[1, 2], k[0], k[1])

    Kinv = K_inverse_3x3(K)
    pix = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)  # (M, 3)
    # Camera math is tiny but accuracy-critical (feeds the PRD loss in pixel
    # units) — force f32 MXU precision instead of the TPU bf16 default.
    dirs = jnp.matmul(pix, Kinv.T, precision="highest")  # (M, 3)
    if cfg.convention == OPENGL:
        dirs = dirs * jnp.asarray([1.0, -1.0, -1.0], dirs.dtype)

    if c2w.ndim == 3:
        rays_d = jnp.einsum("mij,mj->mi", c2w[:, :3, :3], dirs, precision="highest")
        rays_o = c2w[:, :3, 3]
    else:
        rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)

    if add_noise:
        rays_o = rays_o + ray_o_noise_at(camera, px, py)
        rays_d = rays_d + ray_d_noise_at(camera, px, py)
        rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + _EPS)
    return rays_o, rays_d


def full_image_pixels(H: int, W: int):
    """Row-major pixel grid as flat (px, py), matching ``reshape(-1)`` order."""
    py, px = jnp.mgrid[0:H, 0:W]
    return px.reshape(-1).astype(jnp.float32), py.reshape(-1).astype(jnp.float32)


def rays_full_image(camera: Camera, c2w=None, image_idx=None, add_noise: bool = True):
    """All H*W rays of one image; flat ``(H*W, 3)`` row-major, like
    ``get_rays_full_image_use_camera`` (``get_rays.py:26-72``)."""
    px, py = full_image_pixels(camera.config.H, camera.config.W)
    return pixels_to_rays(camera, px, py, c2w=c2w, image_idx=image_idx, add_noise=add_noise)


def rays_no_camera(
    H: int,
    W: int,
    focal,
    c2w: jnp.ndarray,
    px: jnp.ndarray | None = None,
    py: jnp.ndarray | None = None,
):
    """Fixed-camera OpenGL rays (``get_rays.py:5-23,75-90,151-165``).

    ``dirs = [(x - W/2)/f, -(y - H/2)/f, -1]`` rotated into world frame.
    Used for the no-camera-model baselines and precomputed ray pools.
    """
    if px is None:
        px, py = full_image_pixels(H, W)
    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    dirs = jnp.stack(
        [(px - W * 0.5) / focal, -(py - H * 0.5) / focal, -jnp.ones_like(px)],
        axis=-1,
    )
    if c2w.ndim == 3:
        rays_d = jnp.einsum("mij,mj->mi", c2w[:, :3, :3], dirs, precision="highest")
        rays_o = c2w[:, :3, 3]
    else:
        rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_opencv(K: jnp.ndarray, c2w: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                pixel_offset: float = 0.5):
    """Fixed-camera OPENCV rays from a 4x4 (or 3x3-embedded) intrinsic.

    The NeRF++ no-camera-model ray path (``nerf_sample_ray_split.py:
    get_rays_single_image``): ``dirs = K^-1 [u+off, v+off, 1]`` rotated into
    the world frame, origins at the camera centre. Used by the nerfpp
    drivers and samplers when no learnable camera is attached.
    """
    from scnerf_tpu.geometry.so3 import K_inverse_3x3

    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    pix = jnp.stack([px + pixel_offset, py + pixel_offset, jnp.ones_like(px)], -1)
    dirs = jnp.matmul(pix, K_inverse_3x3(jnp.asarray(K)).T, precision="highest")
    c2w = jnp.asarray(c2w)
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d
