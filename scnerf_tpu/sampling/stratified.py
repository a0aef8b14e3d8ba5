"""Stratified depth sampling along rays.

Rebuild of the coarse samplers: NeRF's linspace + per-interval jitter
(``/root/reference/NeRF/render.py:235-257``) and NeRF++'s ``perturb_samples``
(``/root/reference/nerfplusplus/ddp_train_nerf.py:71-80``). Pure functions of
an explicit PRNG key — reproducible and per-device foldable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    lindisp: bool = False,
    perturb: bool = True,
    t_rand=None,
):
    """Coarse depth values per ray.

    Args:
      key: PRNG key (ignored when ``perturb`` is False).
      near, far: ``(N, 1)`` or ``(N,)`` bounds.
      n_samples: static sample count.
      lindisp: sample linearly in inverse depth.
      perturb: stratified jitter within each interval.
      t_rand: optional externally-supplied uniforms (RNG replay).
    Returns:
      ``(N, n_samples)`` sorted depths.
    """
    near = jnp.reshape(near, (-1, 1))
    far = jnp.reshape(far, (-1, 1))
    t = jnp.linspace(0.0, 1.0, n_samples)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (near.shape[0], n_samples))
    if perturb or t_rand is not None:
        z = perturb_z_vals(key, z, t_rand=t_rand)
    return z


def perturb_z_vals(key, z_vals: jnp.ndarray, t_rand=None) -> jnp.ndarray:
    """Jitter each depth uniformly within its surrounding interval
    (``render.py:243-257``).

    ``t_rand``: optional externally-supplied uniforms of ``z_vals.shape``
    (used by the trajectory-parity harness to replay the torch reference's
    RNG draws bit-for-bit); when given, ``key`` is ignored.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    if t_rand is None:
        t_rand = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t_rand
