"""COLMAP pipeline wrapper (pose generation for raw image sets).

Rebuild of ``/root/reference/colmap_utils/colmap.sh`` and
``/root/reference/nerfplusplus/colmap_runner/run_colmap.py``: shells out to
an installed ``colmap`` binary (feature extraction -> exhaustive matching ->
mapper), then converts the sparse model with ``tools/colmap.py``. Gated on
binary availability — importable and testable without COLMAP installed.
"""
from __future__ import annotations

import os
import shutil
import subprocess

from scnerf_tpu.tools.colmap import write_poses_bounds


def colmap_available() -> bool:
    return shutil.which("colmap") is not None


def run_colmap(
    image_dir: str,
    workspace: str,
    camera_model: str = "SIMPLE_RADIAL",
    single_camera: bool = True,
    quiet: bool = True,
) -> str:
    """Run the standard COLMAP SfM pipeline; returns the sparse model dir.

    ``camera_model``: COLMAP model name — the NeRF++ fisheye pipeline uses
    ``RADIAL_FISHEYE`` (``run_colmap.py:11``), the NeRF one pinhole/radial.
    """
    if not colmap_available():
        raise RuntimeError("colmap binary not found on PATH")
    os.makedirs(workspace, exist_ok=True)
    db = os.path.join(workspace, "database.db")
    sparse = os.path.join(workspace, "sparse")
    os.makedirs(sparse, exist_ok=True)
    out = subprocess.DEVNULL if quiet else None

    subprocess.check_call(
        [
            "colmap", "feature_extractor",
            "--database_path", db,
            "--image_path", image_dir,
            "--ImageReader.camera_model", camera_model,
            "--ImageReader.single_camera", "1" if single_camera else "0",
        ],
        stdout=out, stderr=out,
    )
    subprocess.check_call(
        ["colmap", "exhaustive_matcher", "--database_path", db],
        stdout=out, stderr=out,
    )
    subprocess.check_call(
        [
            "colmap", "mapper",
            "--database_path", db,
            "--image_path", image_dir,
            "--output_path", sparse,
        ],
        stdout=out, stderr=out,
    )
    model0 = os.path.join(sparse, "0")
    return model0 if os.path.isdir(model0) else sparse


def images_to_poses_bounds(image_dir: str, workspace: str, out_path: str | None = None):
    """images -> COLMAP -> LLFF poses_bounds.npy (the colmap_utils pipeline)."""
    sparse = run_colmap(image_dir, workspace)
    out_path = out_path or os.path.join(os.path.dirname(image_dir), "poses_bounds.npy")
    return write_poses_bounds(sparse, out_path)
