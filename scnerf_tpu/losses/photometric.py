"""Photometric losses and PSNR.

Rebuild of ``img2mse``/``mse2psnr`` (``/root/reference/NeRF/run_nerf_helpers.py:10-11``,
``/root/reference/nerfplusplus/utils.py:12-31``).
"""
from __future__ import annotations

import jax.numpy as jnp


def img2mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over valid entries only (NeRF++ mask path, ``utils.py:12-21``)."""
    mask = jnp.broadcast_to(mask[..., None], pred.shape).astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(mask * (pred - target) ** 2) / denom


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(jnp.maximum(mse, 1e-12)) / jnp.log(10.0)
