"""Small imaging utilities shared by drivers/tools.

Rebuild of ``to8b`` (``/root/reference/NeRF/render.py:16``) and the depth
colorizer (``/root/reference/nerfplusplus/utils.py:44-127``).
"""
from __future__ import annotations

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def colorize_depth(
    depth: np.ndarray,
    mask: np.ndarray | None = None,
    cmap: str = "jet",
    append_colorbar: bool = False,
) -> np.ndarray:
    """Depth map -> RGB visualization (percentile-normalized like the
    reference's ``colorize``)."""
    import matplotlib

    matplotlib.use("Agg")

    d = np.asarray(depth, np.float64)
    valid = np.isfinite(d) if mask is None else (mask > 0.5) & np.isfinite(d)
    if valid.any():
        lo, hi = np.percentile(d[valid], [2, 98])
        if hi - lo < 1e-10:
            hi = lo + 1e-10
        norm = np.clip((d - lo) / (hi - lo), 0, 1)
    else:
        norm = np.zeros_like(d)
    rgba = matplotlib.colormaps[cmap](norm)
    rgb = rgba[..., :3]
    if mask is not None:
        rgb = np.where((mask > 0.5)[..., None], rgb, 1.0)
    return rgb.astype(np.float32)
