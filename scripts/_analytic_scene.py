"""Geometrically consistent analytic test scenes for the TPU soaks.

Round-2 VERDICT weak item 2: the soaks trained on translated random
textures — not a consistent 3D scene — so they could prove throughput and
finiteness but never quality (held-out PSNR ~10 dB by construction). This
module renders ground-truth images of an ANALYTIC emission/absorption
field (three Gaussian blobs, the scene that demonstrated the +16.2 dB
calibration recovery in ``examples/calibration_ablation.py:41-65``)
through the SAME ray-generation code paths the trainers use, so a
correctly converging model can reach high held-out PSNR.

Two writers:
  * ``build_blender_scene`` — blender layout (transforms_*.json + RGBA
    PNGs, black background) for the NeRF pipeline, rays via
    ``rays_no_camera`` (the exact OPENGL train path).
  * ``build_nerfpp_scene``  — NeRF++ split layout via
    ``tools.colmap.write_nerfpp_split``; rays via the OPENCV
    ``pixel+0.5 -> K^-1`` path, including the radial-distortion warp when
    fisheye ``k`` intrinsics are requested — identical to
    ``camera/rays.py:pixels_to_rays``.

Images are stored as 8-bit PNG, so the quantization floor alone caps
PSNR around ~48 dB; gates in the 25-35 dB range are unaffected.
"""
from __future__ import annotations

import json
import os

import numpy as np


# The calibration_ablation field (centers/widths/amplitudes), uniformly
# scalable: geometry scaled by ``s`` needs widths * s^2 (squared
# distances) and sigma / s (optical depth invariance along s-shorter
# paths).
_CENTERS = np.array([[0.5, 0.2, -0.1], [-0.6, -0.3, 0.3], [0.0, 0.6, 0.5]])
_WIDTHS = np.array([0.08, 0.10, 0.05])
_SIGMA = np.array([40.0, 35.0, 30.0])
_COLORS = np.array([[4.0, -4.0, -4.0], [-4.0, 4.0, -4.0], [-4.0, -4.0, 4.0]])


def field(pts, scale: float = 1.0, texture: bool = False):
    """Raw ``[rgb_logits, sigma]`` of the analytic scene at ``pts``.

    ``texture``: modulate the blob albedo with a 3D-consistent
    high-frequency sine pattern (~8 cycles across a blob). Needed by the
    production-path SIFT legs: smooth gaussians give a DoG detector
    nothing to latch onto, while this pattern yields stable keypoints yet
    stays exactly NeRF-representable (well inside the max_freq_log2=10
    positional-encoding band)."""
    import jax.numpy as jnp

    sigma = 0.0
    rgb = 0.0
    gsum = 0.0
    for c, w, s, col in zip(_CENTERS, _WIDTHS, _SIGMA, _COLORS):
        d2 = jnp.sum((pts - jnp.asarray(c * scale)) ** 2, -1)
        g = jnp.exp(-d2 / (w * scale * scale))
        sigma = sigma + (s / scale) * g
        rgb = rgb + g[..., None] * jnp.asarray(col)
        gsum = gsum + g
    if texture:
        # APERIODIC mix of random-direction plane waves: a single periodic
        # sine makes every SIFT descriptor look alike and the Lowe ratio
        # test rejects all matches (measured: 1-5 matches/pair); 8
        # incommensurate wavevectors give locally distinctive patterns.
        # Moderate |k| (15-45 per blob-unit): volumetric integration
        # low-passes high-frequency 3D texture into invisibility, and the
        # interference of these 8 waves is spotty rather than stripy —
        # DoG-detectable blobs ~8-25 px across at 240x320.
        rngt = np.random.RandomState(11)
        kvecs = rngt.randn(8, 3)
        kvecs *= (rngt.uniform(15.0, 45.0, (8, 1))
                  / np.linalg.norm(kvecs, axis=1, keepdims=True)) / scale
        phases = rngt.uniform(0, 2 * np.pi, 8)
        m = 0.0
        for kv, ph in zip(kvecs, phases):
            m = m + jnp.sin(pts[..., 0] * kv[0] + pts[..., 1] * kv[1]
                            + pts[..., 2] * kv[2] + ph)
        rgb = rgb + (gsum * m * 2.0)[..., None]
    return jnp.concatenate([rgb, sigma[..., None]], -1)


def render_gt_rays(rays_o, rays_d, near: float, far: float,
                   n_samples: int = 192, scale: float = 1.0,
                   texture: bool = False):
    """Ground-truth volume render of the analytic field along given rays."""
    import jax.numpy as jnp

    from scnerf_tpu.render.composite import raw2outputs
    from scnerf_tpu.sampling.stratified import stratified_z_vals

    n = rays_o.shape[0]
    z = stratified_z_vals(None, jnp.full((n,), near), jnp.full((n,), far),
                          n_samples, perturb=False)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    return raw2outputs(field(pts, scale, texture=texture), z, rays_d,
                       white_bkgd=False)["rgb"]


def build_blender_scene(root: str, n_train: int = 12, n_val: int = 2,
                        n_test: int = 2, H: int = 120, W: int = 160,
                        camera_angle_x: float = 0.69,
                        radius: float = 4.0) -> None:
    """Blender-layout export of the analytic scene (black background).

    Views sit on a radius-``radius`` orbit with the elevation varied
    (phi in [-45, -15] deg) so the pose set is well-conditioned for
    calibration; val/test angles interleave the train ones. Rendered
    through ``rays_no_camera`` — bit-identical ray geometry to the
    no-camera train path and f32-identical to the zero-noise camera path.
    """
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import full_image_pixels, rays_no_camera
    from scnerf_tpu.data.blender import pose_spherical

    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    @jax.jit
    def render_view(c2w):
        px, py = full_image_pixels(H, W)
        o, d = rays_no_camera(H, W, focal, c2w, px, py)
        return render_gt_rays(o, d, radius - 2.0, radius + 2.0).reshape(H, W, 3)

    splits = {
        "train": [(360.0 * i / n_train, -30.0 + 15.0 * np.sin(4 * np.pi * i / n_train))
                  for i in range(n_train)],
        "val": [(360.0 * (i + 0.5) / n_val, -25.0) for i in range(n_val)],
        "test": [(360.0 * (i + 0.25) / n_test, -35.0) for i in range(n_test)],
    }
    for split, angles in splits.items():
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i, (theta, phi) in enumerate(angles):
            pose = np.array(pose_spherical(theta, phi, radius))
            rgb = np.asarray(render_view(jnp.asarray(pose[:3, :4])))
            rgba = np.concatenate(
                [np.clip(rgb, 0.0, 1.0), np.ones((H, W, 1))], -1)
            u8 = (rgba * 255.0).round().astype(np.uint8)
            imageio.imwrite(os.path.join(root, split, f"r_{i}.png"), u8)
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)


def _look_at_c2w_opencv(pos: np.ndarray) -> np.ndarray:
    """OPENCV-convention c2w looking at the origin: z forward, y down."""
    z = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return c2w


def build_nerfpp_scene(datadir: str, n_train: int = 8, n_val: int = 2,
                       H: int = 120, W: int = 160,
                       dist_k: tuple | None = None,
                       scale: float = 0.2, cam_radius: float = 0.7,
                       focal_scale: float = 0.9,
                       texture: bool = False) -> str:
    """NeRF++ split-layout export of the analytic scene.

    Cameras ring the origin at radius ``cam_radius`` (inside the NeRF++
    unit foreground sphere) with a slight elevation wobble; the field is
    the blob scene scaled by ``scale`` so it sits well inside the sphere.
    GT rays replicate the production OPENCV path
    (``camera/rays.py:pixels_to_rays``): ``u = px + 0.5`` [-> radial
    distortion when ``dist_k``] ``-> K^-1 -> R``. Returns the scene dir.
    """
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import apply_radial_distortion, full_image_pixels
    from scnerf_tpu.geometry.so3 import K_inverse_3x3
    from scnerf_tpu.tools.colmap import write_nerfpp_split

    # focal_scale < 0.9 widens the FOV so content reaches high normalized
    # radius — required for radial-k OBSERVABILITY: distortion displacement
    # is ~|k1| r^3 f px, sub-pixel for center-weighted content at the
    # default geometry (measured: median 0.19 px at focal 0.9W/scale 0.2,
    # docs/calibration_convergence.md round-4d).
    focal = focal_scale * W
    K = np.eye(4)
    K[0, 0], K[1, 1] = focal, focal
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0

    @jax.jit
    def render_view(c2w):
        px, py = full_image_pixels(H, W)
        u, v = px + 0.5, py + 0.5
        if dist_k is not None:
            u, v = apply_radial_distortion(u, v, K[0, 2], K[1, 2],
                                           dist_k[0], dist_k[1])
        pix = jnp.stack([u, v, jnp.ones_like(u)], -1)
        dirs = jnp.matmul(pix, K_inverse_3x3(jnp.asarray(K)).T,
                          precision="highest")
        rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        near = max(cam_radius - 2.5 * scale, 0.05)
        far = cam_radius + 2.5 * scale
        return render_gt_rays(rays_o, rays_d, near, far,
                              scale=scale, texture=texture).reshape(H, W, 3)

    img_dir = os.path.join(datadir, "_src_images")
    os.makedirs(img_dir, exist_ok=True)
    scene_dir = os.path.join(datadir, "scene")

    def cam_pos(i, n_total):
        ang = 2 * np.pi * i / max(n_total, 3)
        return cam_radius * np.array(
            [np.cos(ang), np.sin(ang), 0.35 + 0.1 * np.sin(2 * ang)])

    n_total = n_train + n_val
    for split, ids in (("train", range(n_train)),
                       ("validation", range(n_train, n_total))):
        cam_dict = {}
        for i in ids:
            name = f"im_{i:02d}.png"
            c2w = _look_at_c2w_opencv(cam_pos(i + 0.5 * (i >= n_train), n_total))
            rgb = np.asarray(render_view(jnp.asarray(c2w)))
            u8 = (np.clip(rgb, 0.0, 1.0) * 255.0).round().astype(np.uint8)
            imageio.imwrite(os.path.join(img_dir, name), u8)
            cam_dict[name] = {
                "K": K.reshape(-1).tolist(),
                "W2C": np.linalg.inv(c2w).reshape(-1).tolist(),
                "img_size": [W, H],
            }
            if dist_k is not None:
                cam_dict[name]["k"] = list(dist_k)
        write_nerfpp_split(cam_dict, scene_dir, split=split,
                           image_src_dir=img_dir)
    return scene_dir
