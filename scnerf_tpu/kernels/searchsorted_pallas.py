"""Pallas TPU kernel: batched row-wise sorted search.

The TPU-native equivalent of the reference's CUDA extension
(``/root/reference/NeRF/torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu``).
Design follows the hardware, not the CUDA code: instead of per-thread binary
search (divergent control flow — poison for a vector unit), each grid step
loads a block of rows into VMEM and performs a dense compare-and-sum
(``sum(v > a)``) on the VPU — branch-free, fully vectorized, one pass.

For NeRF bin counts (N <= a few hundred) this is both faster and simpler
than O(log N) approaches; for very large N the caller
(:mod:`scnerf_tpu.sampling.searchsorted`) falls back to XLA's searchsorted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(side_is_right: bool, a_ref, v_ref, out_ref):
    a = a_ref[:]  # (RB, N)
    v = v_ref[:]  # (RB, M)
    if side_is_right:
        cmp = v[:, :, None] >= a[:, None, :]
    else:
        cmp = v[:, :, None] > a[:, None, :]
    out_ref[:] = jnp.sum(cmp.astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("side", "row_block"))
def searchsorted_pallas(
    a: jnp.ndarray, v: jnp.ndarray, side: str = "left", row_block: int = 256
) -> jnp.ndarray:
    """Row-wise searchsorted on TPU via Pallas.

    Args:
      a: ``(B, N)`` sorted rows.
      v: ``(B, M)`` queries (same batch as ``a``; broadcast is handled by the
        caller).
    Returns:
      ``(B, M)`` int32 insertion indices.
    """
    B, N = a.shape
    _, M = v.shape
    rb = min(row_block, B)
    grid = (pl.cdiv(B, rb),)
    return pl.pallas_call(
        functools.partial(_kernel, side == "right"),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(a, v)
