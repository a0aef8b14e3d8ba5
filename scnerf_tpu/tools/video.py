"""PNG sequence -> video (rebuild of ``/root/reference/src/video.py``; mp4
via imageio-ffmpeg instead of OpenCV avi)."""
from __future__ import annotations

import os

import numpy as np


def frames_to_video(frame_dir: str, out_path: str, fps: int = 30) -> int:
    """Encode all PNGs in ``frame_dir`` (sorted) into a video; returns the
    frame count. Falls back to an .npz stack when no video backend exists."""
    import imageio.v2 as imageio

    files = [
        os.path.join(frame_dir, f)
        for f in sorted(os.listdir(frame_dir))
        if f.endswith(".png")
    ]
    frames = [imageio.imread(f) for f in files]
    if not frames:
        return 0
    try:
        imageio.mimwrite(out_path, frames, fps=fps, quality=8)
    except Exception:
        np.savez_compressed(out_path + ".npz", frames=np.stack(frames))
    return len(frames)


def array_to_video(frames: np.ndarray, out_path: str, fps: int = 30) -> None:
    """(T, H, W, 3) float [0,1] array -> video file."""
    import imageio.v2 as imageio

    frames8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    try:
        imageio.mimwrite(out_path, list(frames8), fps=fps, quality=8)
    except Exception:
        np.savez_compressed(out_path + ".npz", frames=frames8)
