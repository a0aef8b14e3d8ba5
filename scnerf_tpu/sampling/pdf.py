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


def take_along_last(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable gather along the last axis via one-hot contraction.

    On TPU, XLA lowers ``jnp.take_along_axis(x, idx, axis=-1)`` here to a
    per-element scalar-memory gather (and its VJP to a scatter-add):
    measured ~1.6 ms per (2048, 64)-from-(2048, 63) gather — the four
    gathers plus their backward scatters were 33% of the whole NeRF++
    train step (xprof trace, ``scripts/profile_step.py --workload
    nerfpp``). The one-hot contraction is dense compare+multiply+reduce
    (VPU/MXU-friendly, like the compare-and-sum searchsorted), and its
    VJP is the transposed contraction. Exact: one unit weight per row,
    zeros elsewhere, so the sum reproduces the gathered value bit-for-bit
    (for finite ``x``).
    """
    onehot = (idx[..., None] == jnp.arange(x.shape[-1])).astype(x.dtype)
    return jnp.einsum("...sb,...b->...s", onehot, x)


def sort_last_differentiable(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort along the last axis with a dense-contraction VJP.

    ``jnp.sort``'s backward is an XLA scatter that un-permutes the
    cotangent — measured 2.3 ms/step for the NeRF++ cascade's
    (2048, 128) depth merge (xprof trace). ``argsort`` (integers, no
    gradient) + :func:`take_along_last` produces identical forward values
    (both sorts are stable, so ties break the same way) while the
    backward becomes the transposed one-hot contraction.
    """
    return take_along_last(x, jnp.argsort(x, axis=-1))


def sample_pdf(
    key,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
    u: jnp.ndarray | None = None,
    variant: str = "nerf",
) -> jnp.ndarray:
    """Draw ``n_samples`` depths per ray from the piecewise-constant PDF
    defined by ``weights`` over ``bins``.

    Args:
      key: PRNG key (ignored when ``det`` or ``u`` is given).
      bins: ``(N, B)`` bin edges (midpoints of coarse z-vals).
      weights: ``(N, B-1)`` unnormalized interval weights.
      n_samples: static count of new samples.
      det: deterministic (evenly spaced u) instead of uniform random.
      u: optional externally-supplied ``(N, n_samples)`` uniforms (trajectory
        replay of the torch reference's RNG); overrides ``key``/``det``.
      variant: ``"nerf"`` reproduces ``NeRF/render.py:417-460`` (eps 1e-5 on
        weights and the denom guard); ``"nerfpp"`` reproduces the NeRF++
        ``sample_pdf`` (``nerfplusplus/ddp_train_nerf.py:83-132``): eps
        ``TINY_NUMBER = 1e-6`` on weights and the denom guard, and the bin
        width in the final lerp widened by the same TINY.
    Returns:
      ``(N, n_samples)`` sample depths. NOT gradient-stopped; callers that
      want the reference's ``.detach()`` behavior apply
      ``jax.lax.stop_gradient`` (``render.py:274``).
    """
    eps = 1e-6 if variant == "nerfpp" else 1e-5
    weights = weights + eps  # prevent NaNs (render.py:419 / TINY_NUMBER)
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, B)

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, n_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    if variant == "nerfpp":
        # ddp_train_nerf.py:114-116: above = sum(u >= cdf[..., :M]) over only
        # the first M entries -> above in [1, M], below = above - 1. Differs
        # from the NeRF indexing exactly when u >= cdf[..., -1] (possible
        # when the f32 cumsum tops out below the drawn u).
        above = searchsorted(cdf[..., :-1], u, side="right")
        above = jnp.maximum(above, 1)  # cdf[..., 0] == 0 <= u guarantees >= 1
        below = above - 1
    else:
        inds = searchsorted(cdf, u, side="right")
        below = jnp.maximum(inds - 1, 0)
        above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = take_along_last(cdf, below)
    cdf_above = take_along_last(cdf, above)
    bins_below = take_along_last(bins, below)
    bins_above = take_along_last(bins, above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    width = bins_above - bins_below
    if variant == "nerfpp":
        width = width + eps  # ddp_train_nerf.py:130
    return bins_below + t * width
