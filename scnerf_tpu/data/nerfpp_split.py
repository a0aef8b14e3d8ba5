"""NeRF++ split-directory dataset loader.

Rebuild of ``/root/reference/nerfplusplus/data_loader_split.py`` +
the precompute part of ``nerf_sample_ray_split.py``: per-split directories
``rgb/ intrinsics/ pose/ [mask/ min_depth/]`` with one text file per image
containing 16 floats (4x4, row-major) — or 18 when trailing radial ``k1 k2``
are present (``data_loader_split.py:31-44``). Pose translations are divided
by ``normalize_factor`` (``:103``; fisheye configs use 3.0) so cameras land
inside the unit sphere.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


def _parse_txt(path: str) -> np.ndarray:
    with open(path) as f:
        nums = [float(x) for x in f.read().split()]
    return np.asarray(nums, dtype=np.float64)


def _find(dirpath: str, exts=(".txt",)):
    if not os.path.isdir(dirpath):
        return []
    return [os.path.join(dirpath, f) for f in sorted(os.listdir(dirpath)) if f.endswith(exts)]


@dataclass
class NerfPPSplit:
    images: np.ndarray | None  # (N, H, W, 3) or None (test splits may lack rgb)
    intrinsics: np.ndarray  # (N, 4, 4)
    poses: np.ndarray  # (N, 4, 4) c2w
    k: np.ndarray | None  # (N, 2) radial coeffs or None
    masks: np.ndarray | None  # (N, H, W) or None
    min_depths: np.ndarray | None
    img_names: list = field(default_factory=list)
    H: int = 0
    W: int = 0


def load_nerfpp_split(
    basedir: str,
    split: str,
    normalize_factor: float = 1.0,
    testskip: int = 1,
) -> NerfPPSplit:
    d = os.path.join(basedir, split)
    intr_files = _find(os.path.join(d, "intrinsics"))
    pose_files = _find(os.path.join(d, "pose"))
    img_files = _find(
        os.path.join(d, "rgb"), exts=(".png", ".jpg", ".jpeg", ".JPG", ".PNG")
    )
    assert len(intr_files) == len(pose_files), (len(intr_files), len(pose_files))
    skip = 1 if split == "train" or testskip == 0 else testskip
    intr_files = intr_files[::skip]
    pose_files = pose_files[::skip]
    img_files = img_files[::skip] if img_files else []

    intrinsics, ks = [], []
    for f in intr_files:
        vals = _parse_txt(f)
        if len(vals) >= 18:
            intrinsics.append(vals[:16].reshape(4, 4))
            ks.append(vals[16:18])
        else:
            intrinsics.append(vals[:16].reshape(4, 4))
    poses = np.stack([_parse_txt(f)[:16].reshape(4, 4) for f in pose_files], 0)
    poses[:, :3, 3] /= normalize_factor
    intrinsics = np.stack(intrinsics, 0)
    k = np.stack(ks, 0) if ks else None

    images = None
    H = W = 0
    if img_files:
        import imageio.v2 as imageio

        images = np.stack(
            [np.asarray(imageio.imread(f))[..., :3] / 255.0 for f in img_files], 0
        ).astype(np.float32)
        H, W = images.shape[1:3]

    masks = None
    mask_files = _find(os.path.join(d, "mask"), exts=(".png", ".jpg"))
    if mask_files:
        import imageio.v2 as imageio

        masks = np.stack(
            [np.asarray(imageio.imread(f)).astype(np.float32) / 255.0 for f in mask_files[::skip]], 0
        )
        if masks.ndim == 4:
            masks = masks[..., 0]

    # Per-pixel minimum sample depths: ``min_depth/*.png`` scaled by the
    # split-level ``max_depth.txt`` (``nerf_sample_ray_split.py:86-89``:
    # img/255 * max_depth + 1e-4); used as the fg near bound per ray.
    min_depths = None
    md_files = _find(os.path.join(d, "min_depth"), exts=(".png", ".jpg"))
    max_depth_path = os.path.join(d, "max_depth.txt")
    if md_files and os.path.exists(max_depth_path):
        import imageio.v2 as imageio

        max_depth = float(open(max_depth_path).readline().strip())
        min_depths = np.stack(
            [np.asarray(imageio.imread(f)).astype(np.float32) / 255.0
             for f in md_files[::skip]], 0
        )
        if min_depths.ndim == 4:
            min_depths = min_depths[..., 0]
        min_depths = min_depths * max_depth + 1e-4

    return NerfPPSplit(
        images=images,
        intrinsics=intrinsics.astype(np.float32),
        poses=poses.astype(np.float32),
        k=None if k is None else k.astype(np.float32),
        masks=masks,
        min_depths=None if min_depths is None else min_depths.astype(np.float32),
        img_names=[os.path.basename(f) for f in (img_files or pose_files)],
        H=H,
        W=W,
    )


def check_cameras_in_unit_sphere(poses: np.ndarray) -> None:
    """The NeRF++ normalization contract (``ddp_train_nerf.py:61-65``):
    every camera center must be inside the unit sphere. Raises otherwise —
    at load time, not inside the compiled step."""
    norms = np.linalg.norm(poses[:, :3, 3], axis=-1)
    if (norms >= 1.0).any():
        raise ValueError(
            f"cameras outside unit sphere (max |t| = {norms.max():.3f}); "
            "normalize the dataset (normalize_factor) first"
        )
