"""Pallas TPU kernel: fused hierarchical inverse-CDF resampling.

Fuses the entire ``sample_pdf`` chain (``/root/reference/NeRF/render.py:
417-460``) — pdf normalize, cumsum, sorted search, bracketing gather, linear
interpolation — into one VMEM-resident pass per block of rays. The gather is
eliminated entirely: the bracketing interval is a one-hot indicator computed
from the same comparisons as the search, and "gathers" become masked
reductions over the bin axis (VPU-friendly; no dynamic indexing).

This is the performance path; :mod:`scnerf_tpu.sampling.pdf` is the
reference-semantics baseline the kernel is tested against.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bins_ref, weights_ref, u_ref, out_ref):
    bins = bins_ref[:]  # (RB, B)
    w = weights_ref[:] + 1e-5  # (RB, B-1)
    u = u_ref[:]  # (RB, S)

    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    # cumsum as a triangular matmul (Pallas TPU has no cumsum primitive and
    # the MXU eats this for free at B ~ 64): cdf_j = sum_{i <= j} pdf_i.
    nb = pdf.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    tri = (rows <= cols).astype(pdf.dtype)
    cdf_inner = jax.lax.dot_general(
        pdf, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(pdf.dtype)
    cdf = jnp.concatenate([jnp.zeros_like(cdf_inner[:, :1]), cdf_inner], axis=-1)

    # searchsorted(cdf, u, side='right') via compare-and-sum.
    cmp = (u[:, :, None] >= cdf[:, None, :]).astype(jnp.int32)  # (RB, S, B)
    inds = jnp.sum(cmp, axis=-1)  # in [1, B]
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    # One-hot interval selection replaces take_along_axis.
    b_iota = jax.lax.broadcasted_iota(jnp.int32, cmp.shape, dimension=2)
    onehot_below = (b_iota == below[:, :, None]).astype(bins.dtype)
    onehot_above = (b_iota == above[:, :, None]).astype(bins.dtype)

    cdf_b = jnp.sum(onehot_below * cdf[:, None, :], axis=-1)
    cdf_a = jnp.sum(onehot_above * cdf[:, None, :], axis=-1)
    bins_b = jnp.sum(onehot_below * bins[:, None, :], axis=-1)
    bins_a = jnp.sum(onehot_above * bins[:, None, :], axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    out_ref[:] = bins_b + t * (bins_a - bins_b)


@functools.partial(jax.jit, static_argnames=("row_block",))
def sample_pdf_pallas_core(
    bins: jnp.ndarray, weights: jnp.ndarray, u: jnp.ndarray, row_block: int = 32
) -> jnp.ndarray:
    """Fused inverse-CDF transform (pre-drawn ``u``).

    Args:
      bins: ``(N, B)`` bin edges.
      weights: ``(N, B-1)`` unnormalized weights.
      u: ``(N, S)`` uniform samples.
    Returns:
      ``(N, S)`` resampled depths.
    """
    N, B = bins.shape
    S = u.shape[-1]
    rb = min(row_block, N)
    grid = (pl.cdiv(N, rb),)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, S), bins.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, B - 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(bins, weights, u)


def sample_pdf_pallas(key, bins, weights, n_samples: int, det: bool = False):
    """Drop-in replacement for :func:`scnerf_tpu.sampling.pdf.sample_pdf`."""
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, bins.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, bins.shape[:-1] + (n_samples,))
    return sample_pdf_pallas_core(bins, weights, u)
