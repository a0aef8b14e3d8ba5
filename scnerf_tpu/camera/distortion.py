"""Inverse radial-distortion lookup.

Rebuild of ``/root/reference/model/lookup.py``: invert the monotone per-axis
forward distortion ``f(c) = (1 + k1 d^2 + k2 d^4)(c - L/2) + L/2`` (with
``d = (c - L/2)/(L/2)``) by tabulating it on ``2^level + 1`` candidates and
sorted-searching the query, then linearly interpolating between the
bracketing candidates.

TPU-native: the sorted search is :func:`scnerf_tpu.sampling.searchsorted`
(vectorized compare-and-sum / Pallas kernel), not a CUDA extension.
"""
from __future__ import annotations

import jax.numpy as jnp

from scnerf_tpu.sampling.searchsorted import searchsorted


def lookup_axis(L: float, k: jnp.ndarray, loc: jnp.ndarray, level: int = 8):
    """Invert the forward distortion along one axis of length ``L``.

    Args:
      L: axis length (W or H).
      k: ``(2,)`` distortion coefficients.
      loc: ``(M,)`` distorted coordinates to invert.
      level: table has ``2^level + 1`` entries.
    Returns:
      (valid ``(M,)`` bool, idx ``(M,)`` int in [1, 2^level], table values
      ``(T,)``, candidates ``(T,)``).
    """
    n = 2**level
    candidate = jnp.arange(0, n + 1, dtype=jnp.float32) * (L / n)
    d = (candidate - L / 2) / (L / 2)
    val = (1.0 + k[0] * d**2 + k[1] * d**4) * (candidate - L / 2) + L / 2

    idx = searchsorted(val[None, :], loc[None, :], side="left")[0]
    valid = jnp.logical_and(idx <= n, idx > 0)
    idx = jnp.clip(idx, 1, n)
    return valid, idx, val, candidate


def undistort_pixels(W: int, H: int, k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, level: int = 8):
    """Map distorted pixel coords back to undistorted ones (``lookup.py:20-33``).

    Returns:
      (valid ``(M,)`` bool, xy ``(M, 2)``).
    """
    vx, ix, val_x, cand_x = lookup_axis(float(W), k, x, level)
    vy, iy, val_y, cand_y = lookup_axis(float(H), k, y, level)
    valid = jnp.logical_and(vx, vy)

    inter_x = val_x[ix] - val_x[ix - 1]
    inter_y = val_y[iy] - val_y[iy - 1]
    x_out = (cand_x[ix] * (x - val_x[ix - 1]) + cand_x[ix - 1] * (val_x[ix] - x)) / inter_x
    y_out = (cand_y[iy] * (y - val_y[iy - 1]) + cand_y[iy - 1] * (val_y[iy] - y)) / inter_y
    return valid, jnp.stack([x_out, y_out], axis=-1)
