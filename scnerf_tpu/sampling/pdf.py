"""Hierarchical inverse-CDF resampling (NeRF "fine" sampling).

Rebuild of ``sample_pdf`` (``/root/reference/NeRF/render.py:417-460`` and the
NeRF++ variant ``/root/reference/nerfplusplus/ddp_train_nerf.py:83-132``).
The CDF inversion uses the compare-and-sum sorted search
(:mod:`scnerf_tpu.sampling.searchsorted`) — dense, branch-free, VPU-friendly —
in place of the reference's CUDA ``searchsorted`` extension. A fused Pallas
kernel for the whole inverse-CDF transform lives in
``scnerf_tpu/kernels/pdf_pallas.py`` and is used on TPU when available.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scnerf_tpu.sampling.searchsorted import searchsorted


def sample_pdf(
    key,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Draw ``n_samples`` depths per ray from the piecewise-constant PDF
    defined by ``weights`` over ``bins``.

    Args:
      key: PRNG key (ignored when ``det``).
      bins: ``(N, B)`` bin edges (midpoints of coarse z-vals).
      weights: ``(N, B-1)`` unnormalized interval weights.
      n_samples: static count of new samples.
      det: deterministic (evenly spaced u) instead of uniform random.
    Returns:
      ``(N, n_samples)`` sample depths. NOT gradient-stopped; callers that
      want the reference's ``.detach()`` behavior apply
      ``jax.lax.stop_gradient`` (``render.py:274``).
    """
    weights = weights + 1e-5  # prevent NaNs (render.py:419)
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, B)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = searchsorted(cdf, u, side="right")
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
