"""Alpha compositing of raw field outputs along rays.

Rebuild of ``raw2outputs`` (``/root/reference/NeRF/render.py:302-355``):
``alpha = 1 - exp(-relu(sigma) * dist)``, exclusive-cumprod transmittance with
the reference's ``+1e-10`` guard, depth/disparity/accumulation maps, optional
white background. All ops are a single fused VPU pass under XLA; the cumprod
is ``jnp.cumprod`` over the (static) sample axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key=None,
    sigma_activation: str = "relu",
    noise=None,
):
    """Composite raw ``[rgb, sigma]`` samples into per-ray maps.

    Args:
      raw: ``(N, S, 4)``.
      z_vals: ``(N, S)`` sample depths.
      rays_d: ``(N, 3)`` (un-normalized; its norm scales the step sizes).
      raw_noise_std: std of regularizing noise added to sigma pre-activation.
      white_bkgd: composite onto white.
      noise_key: PRNG key, required when ``raw_noise_std > 0``.
      sigma_activation: "relu" (NeRF, ``render.py:316``) or "abs"
        (NeRF++, ``nerf_network.py:133-134``).
    Returns:
      dict with rgb ``(N, 3)``, disp ``(N,)``, acc ``(N,)``,
      weights ``(N, S)``, depth ``(N,)``.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if noise is not None:
        # externally-supplied standard normals (RNG replay), pre-scaled here
        sigma = sigma + noise * raw_noise_std
    elif raw_noise_std > 0.0:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std
    if sigma_activation == "relu":
        sigma = jax.nn.relu(sigma)
    elif sigma_activation == "abs":
        sigma = jnp.abs(sigma)
    else:
        raise ValueError(sigma_activation)

    alpha = 1.0 - jnp.exp(-sigma * dists)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    # Exclusive cumprod: shift right, leading 1.
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / (acc_map + 1e-10)
    )
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {
        "rgb": rgb_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
        "depth": depth_map,
    }
