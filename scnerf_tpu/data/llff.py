"""LLFF forward-facing dataset loader.

Rebuild of ``/root/reference/NeRF/load_llff.py`` (itself from Fyusion/LLFF):
``poses_bounds.npy`` parsing, axis-convention fix, bd rescale, pose
recentering, spherify or spiral render path, ``llffhold`` split, and the
self-calibration noise injection (delegated to ``data/noise.py``).

Host-side numpy. Minification uses PIL area resampling instead of shelling
out to ImageMagick ``mogrify`` (``load_llff.py:12-61``); downscaled copies
are cached in ``images_{factor}/`` exactly like the reference so datasets
are interchangeable.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".PNG", ".JPEG")


def _list_images(d: str) -> list[str]:
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(_IMG_EXTS)]


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))[..., :3] / 255.0


def _minify(basedir: str, factor: int) -> str:
    """Create/reuse ``images_{factor}`` with PIL area downsampling."""
    out = os.path.join(basedir, f"images_{factor}")
    src = _list_images(os.path.join(basedir, "images"))
    if os.path.exists(out) and len(_list_images(out)) == len(src):
        return out
    from PIL import Image

    os.makedirs(out, exist_ok=True)
    for f in src:
        img = Image.open(f)
        w, h = img.size
        img = img.resize((w // factor, h // factor), Image.LANCZOS)
        name = os.path.splitext(os.path.basename(f))[0] + ".png"
        img.save(os.path.join(out, name))
    return out


def normalize(x):
    return x / np.linalg.norm(x)


def viewmatrix(z, up, pos):
    vec2 = normalize(z)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses):
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = np.concatenate([poses_avg(poses)[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    p44 = np.concatenate([poses[:, :3, :4], bottom], -2)
    p44 = np.linalg.inv(c2w) @ p44
    poses_[:, :3, :4] = p44[:, :3, :4]
    return poses_


def render_path_spiral(c2w, up, rads, focal, zrate, rots, N):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]) * rads,
        )
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return np.stack(render_poses, 0)


def spherify_poses(poses, bds):
    p34_to_44 = lambda p: np.concatenate(
        [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])], 1
    )
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -A_i @ rays_o
    pt_mindist = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0)) @ (b_i).mean(0)
    )
    center = pt_mindist
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = normalize(up)
    vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)
    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc
    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up2 = np.array([0, 0, -1.0])
        vec2 = normalize(camorigin)
        vec0 = normalize(np.cross(vec2, up2))
        vec1 = normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)], -1
    )
    poses_reset = np.concatenate(
        [poses_reset[:, :3, :4], np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape)],
        -1,
    )
    return poses_reset, new_poses, bds


@dataclass
class LLFFData:
    images: np.ndarray  # (N, H, W, 3) float
    noisy_poses: np.ndarray  # (N, 4, 4) train-perturbed c2w
    gt_poses: np.ndarray  # (N, 4, 4)
    bds: np.ndarray  # (N, 2)
    render_poses: np.ndarray  # (R, 3, 5)
    i_train: np.ndarray
    i_test: np.ndarray
    gt_intrinsic: np.ndarray  # (4, 4)
    noisy_focal: float
    H: int = 0
    W: int = 0


def load_llff(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: float = 0.75,
    spherify: bool = False,
    llffhold: int = 8,
    path_zflat: bool = False,
    noise: NoiseConfig | None = None,
    rng: np.random.RandomState | None = None,
) -> LLFFData:
    """Load an LLFF scene directory (``poses_bounds.npy`` + ``images/``)."""
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    imgdir = _minify(basedir, factor) if factor > 1 else os.path.join(basedir, "images")
    imgfiles = _list_images(imgdir)
    assert poses.shape[-1] == len(imgfiles), (poses.shape, len(imgfiles))
    imgs = np.stack([_imread(f) for f in imgfiles], 0).astype(np.float32)
    sh = imgs[0].shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    # down-up-right -> right-up-back convention fix (load_llff.py:248).
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds *= sc
    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal_path = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        n_rots, n_views = 2, 120
        if path_zflat:
            # flattened spiral (load_llff.py:289-295)
            zloc = -close_depth * 0.1
            c2w[:3, 3] = c2w[:3, 3] + zloc * c2w[:3, 2]
            rads[2] = 0.0
            n_rots, n_views = 1, 60
        render_poses = render_path_spiral(
            c2w, up, rads, focal_path, zrate=0.5, rots=n_rots, N=n_views
        )

    c2w = poses_avg(poses)
    if llffhold > 0:
        i_test = np.arange(imgs.shape[0])[::llffhold]
    else:
        dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
        i_test = np.array([np.argmin(dists)])
    i_train = np.array([i for i in range(len(poses)) if i not in i_test])

    H, W = sh[:2]
    focal = float(poses[0, -1, -1])
    gt_poses = np.eye(4)[None].repeat(len(poses), 0).astype(np.float32)
    gt_poses[:, :3, :4] = poses[:, :3, :4]

    noise = noise or NoiseConfig()
    noisy_poses, noisy_focal = inject_pose_noise(
        poses[:, :3, :4], focal, i_train, noise, rng
    )
    gt_K = np.array(
        [[focal, 0, W // 2, 0], [0, focal, H // 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    return LLFFData(
        images=imgs,
        noisy_poses=noisy_poses.astype(np.float32),
        gt_poses=gt_poses,
        bds=bds,
        render_poses=render_poses.astype(np.float32),
        i_train=i_train,
        i_test=i_test,
        gt_intrinsic=gt_K,
        noisy_focal=float(noisy_focal),
        H=H,
        W=W,
    )
