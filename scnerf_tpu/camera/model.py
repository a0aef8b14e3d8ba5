"""The differentiable generic camera model (the SCNeRF contribution).

A single pytree, :class:`Camera`, replaces both reference classes
``PinholeModelRotNoiseLearning10kRayoRayd`` and
``...Distortion`` (``/root/reference/model/camera_model.py:120-312``):

- pinhole intrinsics ``[fx, fy, cx, cy]`` = frozen initial + learnable noise
  (optionally multiplicative),
- per-image extrinsics = frozen initial 9-vector (6D rotation + translation)
  + learnable noise, decoded through Gram-Schmidt,
- radial distortion ``(k1, k2)`` = frozen initial + learnable noise,
- learnable ray-origin / ray-direction noise on a coarse ``(H//g, W//g, 3)``
  grid, bilinearly upsampled to pixel resolution.

TPU-first design notes:
- All state is a flat pytree -> trains under one ``jit`` with the NeRF params;
  curriculum "unfreezing" is gradient masking (``train/curriculum.py``), not
  ``requires_grad_`` mutation.
- Grid noise is *gathered* at the requested pixels and interpolated there
  (O(#rays)), instead of upsampling the full (H*W, 3) image every call as the
  reference does (``camera_model.py:24-46``). The interpolation reproduces
  ``F.interpolate(mode="bilinear", align_corners=False)`` exactly at pixel
  centers, so numerics match.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.geometry.so3 import (
    embed_rotation_44,
    intrinsic_param_to_K,
    ortho2rotation,
    rotation2orth,
)

OPENGL = "opengl"  # NeRF convention: K^-1 [x,y,1], then negate y and z
OPENCV = "opencv"  # NeRF++ convention: K^-1 [u+.5, v+.5, 1], no flips


@pytree_dataclass
class CameraConfig:
    """Static camera configuration (pytree metadata)."""

    H: int = static_field(default=0)
    W: int = static_field(default=0)
    grid_size: int = static_field(default=10)
    convention: str = static_field(default=OPENGL)
    use_distortion: bool = static_field(default=False)
    multiplicative_noise: bool = static_field(default=False)
    ray_o_noise_scale: float = static_field(default=1e-3)
    ray_d_noise_scale: float = static_field(default=1e-3)
    intrinsics_noise_scale: float = static_field(default=1.0)
    extrinsics_noise_scale: float = static_field(default=1e-2)
    distortion_noise_scale: float = static_field(default=1e-2)
    # Pixel-center offset added before K^-1 (0.0 for NeRF, 0.5 for NeRF++).
    pixel_offset: float = static_field(default=0.0)
    # Replicate the reference DISTORTION variant's shared-storage quirk:
    # ``...Distortion.__init__`` registers ``ray_o_noise`` and ``ray_d_noise``
    # from the SAME zero tensor (``camera_model.py:224,258-262``), so in torch
    # they alias one buffer that receives BOTH Adam updates (each with its own
    # optimizer state) every step, and both ray paths read the summed result.
    # Exact emulation with two pytree leaves: each path reads
    # ``own_grid + stop_gradient(other_grid)`` — the value is the shared sum
    # while gradients stay split per-path, so two independent Adam updates
    # compose identically to torch's sequential in-place updates.
    tied_ray_noise: bool = static_field(default=False)


@pytree_dataclass
class Camera:
    """Learnable camera state. ``noise`` leaves are the trainable ones."""

    config: CameraConfig = static_field(default=None)
    # Frozen initials (still pytree leaves so checkpoints carry them; the
    # optimizer masks them out — see train/optim.py).
    intrinsics_init: jnp.ndarray = None  # (4,)  fx fy cx cy
    extrinsics_init: jnp.ndarray = None  # (N, 9) 6D rot + t
    distortion_init: jnp.ndarray = None  # (2,)  k1 k2
    # Learnable noises (zero-init).
    intrinsics_noise: jnp.ndarray = None  # (4,)
    extrinsics_noise: jnp.ndarray = None  # (N, 9)
    distortion_noise: jnp.ndarray = None  # (2,)
    ray_o_grid: jnp.ndarray = None  # (H//g, W//g, 3)
    ray_d_grid: jnp.ndarray = None  # (H//g, W//g, 3)


def init_camera(
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    config: CameraConfig,
    k: np.ndarray | None = None,
    dtype=jnp.float32,
) -> Camera:
    """Build a :class:`Camera` from initial K (3x3/4x4) and c2w poses (N,4,4).

    Mirrors the reference constructors (``camera_model.py:120-163,209-265``):
    extrinsics are stored as [6D-rotation | translation]; all noises zero.
    """
    intrinsics = np.asarray(intrinsics)
    extrinsics = np.asarray(extrinsics)
    fx, fy, cx, cy = (
        intrinsics[0, 0],
        intrinsics[1, 1],
        intrinsics[0, 2],
        intrinsics[1, 2],
    )
    rot6 = np.asarray(rotation2orth(jnp.asarray(extrinsics[:, :3, :3])))
    trans = extrinsics[:, :3, 3]
    ext9 = np.concatenate([rot6, trans], axis=-1)
    gh = max(config.H // config.grid_size, 1)
    gw = max(config.W // config.grid_size, 1)
    n = extrinsics.shape[0]
    if k is None:
        k = np.zeros((2,), dtype=np.float32)
    return Camera(
        config=config,
        intrinsics_init=jnp.asarray([fx, fy, cx, cy], dtype=dtype),
        extrinsics_init=jnp.asarray(ext9, dtype=dtype),
        distortion_init=jnp.asarray(k, dtype=dtype),
        intrinsics_noise=jnp.zeros((4,), dtype=dtype),
        extrinsics_noise=jnp.zeros((n, 9), dtype=dtype),
        distortion_noise=jnp.zeros((2,), dtype=dtype),
        ray_o_grid=jnp.zeros((gh, gw, 3), dtype=dtype),
        ray_d_grid=jnp.zeros((gh, gw, 3), dtype=dtype),
    )


# --------------------------------------------------------------------------
# Parameter decoders (reference: get_intrinsic / get_extrinsic / get_distortion)
# --------------------------------------------------------------------------

def get_intrinsic(camera: Camera) -> jnp.ndarray:
    """Current 4x4 K (``camera_model.py:166-177``)."""
    cfg = camera.config
    if cfg.multiplicative_noise:
        params = camera.intrinsics_init + (
            camera.intrinsics_noise * cfg.intrinsics_noise_scale * camera.intrinsics_init
        )
    else:
        params = camera.intrinsics_init + camera.intrinsics_noise * cfg.intrinsics_noise_scale
    return intrinsic_param_to_K(params)


def get_extrinsics(camera: Camera) -> jnp.ndarray:
    """Current (N, 4, 4) c2w extrinsics (``camera_model.py:179-190``)."""
    cfg = camera.config
    vec = camera.extrinsics_init + cfg.extrinsics_noise_scale * camera.extrinsics_noise
    R = ortho2rotation(vec[:, :6])
    E = embed_rotation_44(R)
    return E.at[:, :3, 3].set(vec[:, 6:])


def get_extrinsic(camera: Camera, idx) -> jnp.ndarray:
    """Single (or gathered) c2w extrinsic(s) for image index/indices ``idx``."""
    cfg = camera.config
    vec = camera.extrinsics_init[idx] + cfg.extrinsics_noise_scale * camera.extrinsics_noise[idx]
    R = ortho2rotation(vec[..., :6])
    E = embed_rotation_44(R)
    return E.at[..., :3, 3].set(vec[..., 6:])


def get_distortion(camera: Camera) -> jnp.ndarray:
    """Current (k1, k2) (``camera_model.py:310-312``)."""
    return camera.distortion_init + camera.distortion_noise * camera.config.distortion_noise_scale


# --------------------------------------------------------------------------
# Grid-noise sampling
# --------------------------------------------------------------------------

def sample_noise_grid(
    grid: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, H: int, W: int
) -> jnp.ndarray:
    """Bilinearly sample a coarse (Gh, Gw, C) grid at integer pixel (px, py).

    Numerically identical (at pixel centers) to upsampling the grid to (H, W)
    with ``F.interpolate(mode="bilinear", align_corners=False)`` and indexing
    — the reference's path (``camera_model.py:24-46`` + ``get_rays.py:60-71``)
    — but costs O(#pixels-requested) instead of O(H*W).

    Args:
      grid: ``(Gh, Gw, C)``.
      px, py: ``(M,)`` pixel column / row indices (float or int).
      H, W: full image size.
    Returns:
      ``(M, C)``.
    """
    gh, gw = grid.shape[0], grid.shape[1]
    # align_corners=False source coordinate; negative coords clamp to 0
    # (PyTorch's area_pixel_compute_source_index semantics).
    sy = jnp.maximum((py.astype(jnp.float32) + 0.5) * (gh / H) - 0.5, 0.0)
    sx = jnp.maximum((px.astype(jnp.float32) + 0.5) * (gw / W) - 0.5, 0.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0 = jnp.clip(y0, 0, gh - 1)
    x0 = jnp.clip(x0, 0, gw - 1)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    g00 = grid[y0, x0]
    g01 = grid[y0, x1]
    g10 = grid[y1, x0]
    g11 = grid[y1, x1]
    top = g00 * (1.0 - wx) + g01 * wx
    bot = g10 * (1.0 - wx) + g11 * wx
    return top * (1.0 - wy) + bot * wy


def ray_o_noise_at(camera: Camera, px, py) -> jnp.ndarray:
    cfg = camera.config
    grid = camera.ray_o_grid
    if cfg.tied_ray_noise:
        grid = grid + jax.lax.stop_gradient(camera.ray_d_grid)
    return sample_noise_grid(grid, px, py, cfg.H, cfg.W) * cfg.ray_o_noise_scale


def ray_d_noise_at(camera: Camera, px, py) -> jnp.ndarray:
    cfg = camera.config
    grid = camera.ray_d_grid
    if cfg.tied_ray_noise:
        grid = jax.lax.stop_gradient(camera.ray_o_grid) + grid
    return sample_noise_grid(grid, px, py, cfg.H, cfg.W) * cfg.ray_d_noise_scale


# --------------------------------------------------------------------------
# Logging (reference: CameraModel.log_noises, camera_model.py:54-117)
# --------------------------------------------------------------------------

def camera_log_images(camera: Camera) -> dict:
    """Image summaries mirroring ``log_noises``'s wandb.Image dashboard
    (``camera_model.py:96-113``): the rayo/rayd noise grids rendered as
    min-max-normalized RGB (``to_pil_normalize``, ``camera_utils.py:66-76``)
    plus, for distortion cameras, the radial warp magnitude field."""
    import numpy as np

    def normalize(g):
        g = np.asarray(g, np.float32)
        lo, hi = g.min(), g.max()
        return (g - lo) / (hi - lo) if hi > lo else np.zeros_like(g)

    o_grid, d_grid = camera.ray_o_grid, camera.ray_d_grid
    if camera.config.tied_ray_noise:
        o_grid = d_grid = o_grid + d_grid  # the shared effective value
    out = {
        "camera/ray_o_noise": normalize(o_grid),
        "camera/ray_d_noise": normalize(d_grid),
    }
    if camera.config.use_distortion:
        from scnerf_tpu.tools.visualize import radial_distortion_field

        k = np.asarray(get_distortion(camera))
        field = radial_distortion_field(
            k, max(camera.config.H, 2), max(camera.config.W, 2))
        f3 = normalize(field)
        out["camera/radial_field"] = np.repeat(f3[..., None], 3, axis=-1) \
            if f3.ndim == 2 else f3
    return out


def camera_log_dict(camera: Camera, gt_K=None, gt_E=None) -> dict:
    """Scalar diagnostics mirroring the reference's wandb dashboard."""
    K = get_intrinsic(camera)
    out = {
        "camera/fx": K[0, 0],
        "camera/fy": K[1, 1],
        "camera/cx": K[0, 2],
        "camera/cy": K[1, 2],
    }
    if gt_K is not None:
        gt_K = jnp.asarray(gt_K)
        out["camera/fx_err"] = jnp.abs(K[0, 0] - gt_K[0, 0])
        out["camera/fy_err"] = jnp.abs(K[1, 1] - gt_K[1, 1])
        out["camera/cx_err"] = jnp.abs(K[0, 2] - gt_K[0, 2])
        out["camera/cy_err"] = jnp.abs(K[1, 2] - gt_K[1, 2])
    E = get_extrinsics(camera)
    out["camera/extrinsic_noise_mean"] = jnp.mean(jnp.abs(E))
    out["camera/extrinsic_noise_std"] = jnp.std(jnp.abs(E))
    if gt_E is not None:
        out["camera/extrinsic_err"] = jnp.mean(jnp.abs(E - jnp.asarray(gt_E)))
    out["camera/ray_o_noise_mean"] = jnp.mean(jnp.abs(camera.ray_o_grid)) * camera.config.ray_o_noise_scale
    out["camera/ray_d_noise_mean"] = jnp.mean(jnp.abs(camera.ray_d_grid)) * camera.config.ray_d_noise_scale
    if camera.config.use_distortion:
        k = get_distortion(camera)
        out["camera/k1"] = k[0]
        out["camera/k2"] = k[1]
    return out
