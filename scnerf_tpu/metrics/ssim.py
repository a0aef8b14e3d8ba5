"""SSIM in pure JAX.

Replaces the reference's ``piqa.SSIM`` dependency
(``/root/reference/NeRF/run_nerf.py:44-45,79-80``,
``nerfplusplus/ddp_test_nerf.py:18-19,121-123``) with the standard Wang et
al. formulation: 11x11 Gaussian window (sigma 1.5), k1=0.01, k2=0.03,
value range 1 — piqa's defaults, so reported numbers are comparable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 2D filtering of an (H, W, C) image, per channel."""
    k = kernel[:, :, None, None]  # (kh, kw, 1, 1)
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(k, (3, 2, 0, 1)),  # (1, 1, kh, kw) OIHW
        window_strides=(1, 1),
        padding="VALID",
        # TPU convs default to bf16 accumulation; the E[x^2] - mu^2
        # cancellation below then produces ~1e-3-scale NEGATIVE variances
        # on converged renders, the denominator crosses zero and
        # per-window ratios explode (observed: "SSIM" 14.7 on a 32 dB
        # render). Metric math needs full f32.
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    k1: float = 0.01,
    k2: float = 0.03,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM between two (H, W, C) images in [0, 1]."""
    kernel = _gaussian_kernel(win_size, sigma)
    c1 = k1**2
    c2 = k2**2
    mu_x = _filter2d(pred, kernel)
    mu_y = _filter2d(target, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # Variances are nonnegative by definition; the subtraction can round
    # slightly below zero, so clamp (keeps the denominator >= c2 > 0).
    sigma_xx = jnp.maximum(_filter2d(pred * pred, kernel) - mu_xx, 0.0)
    sigma_yy = jnp.maximum(_filter2d(target * target, kernel) - mu_yy, 0.0)
    sigma_xy = _filter2d(pred * target, kernel) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)
