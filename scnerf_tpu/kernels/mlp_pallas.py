"""EXPERIMENTAL: fully-fused positional-encoding + NeRF-MLP Pallas kernel.

For each tile of sample points this computes the sinusoidal encodings and
runs the entire 8-layer MLP (+viewdir head) without leaving VMEM — one HBM
read of the points, one HBM write of the raw ``[rgb, sigma]``.

**Measured result (v5e, 196k points, tile=1024): 12.9 ms vs 2.6 ms for the
plain XLA forward — the fusion LOSES 5x.** XLA already pipelines the large
batched matmuls at near-peak MXU utilization and fuses the elementwise
encoding/activation work into them; the tile-serialized kernel adds grid
overhead and pays heavily for the lane-unaligned feature widths (63, 319,
283, 27). This is the honest TPU-first conclusion: Pallas effort belongs
where dense XLA loses (the gatherless inverse-CDF kernel, which ships as the
default), not in re-scheduling matmul chains the compiler already handles.
The HBM-bandwidth problem in the *backward* pass is solved instead by
sample-chunked rematerialization (``fields/nerf.py:query_field_chunked``,
~2x whole-step speedup — see CLAUDE.md).

Kept as a measured reference point and a starting base for future work
(candidates: width-sharded weight-stationary layout, bf16 tiles, wider
lane-aligned feature packing). NOT wired into any default path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scnerf_tpu.fields.nerf import NeRFConfig


def _encode(x, n_freqs):
    """In-kernel positional encoding, ordering identical to
    fields/encoding.py: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]."""
    feats = [x]
    for i in range(n_freqs):
        s = x * (2.0**i)
        feats.append(jnp.sin(s))
        feats.append(jnp.cos(s))
    return jnp.concatenate(feats, axis=-1)


def _kernel(n_freqs_pos, n_freqs_view, skip_at, pts_ref, vd_ref, *refs):
    # refs: w0..w7, b0..b7, wf, bf, wa, ba, wv, bv, wr, br, out_ref
    out_ref = refs[-1]
    w = refs[:-1]
    pts = pts_ref[:]  # (T, 3)
    vd = vd_ref[:]  # (T, 3)

    pe = _encode(pts, n_freqs_pos)  # (T, 63)
    ve = _encode(vd, n_freqs_view)  # (T, 27)

    def dense(h, wi, bi):
        return (
            jnp.dot(h, wi[:], preferred_element_type=jnp.float32) + bi[:][None, :]
        )

    h = pe
    for i in range(8):
        h = jax.nn.relu(dense(h, w[2 * i], w[2 * i + 1]))
        if i == skip_at:
            h = jnp.concatenate([pe, h], axis=-1)
    wf, bf, wa, ba, wv, bv, wr, br = w[16:24]
    alpha = dense(h, wa, ba)  # (T, 1)
    feat = dense(h, wf, bf)  # (T, 256)
    hv = jax.nn.relu(dense(jnp.concatenate([feat, ve], axis=-1), wv, bv))
    rgb = dense(hv, wr, br)  # (T, 3)
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)


def supports_config(cfg: NeRFConfig) -> bool:
    return (
        cfg.depth == 8
        and cfg.width == 256
        and tuple(cfg.skips) == (4,)
        and cfg.use_viewdirs
        and cfg.compute_dtype == "float32"
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tile"))
def fused_query_field(params, cfg: NeRFConfig, pts, viewdirs, tile: int = 1024):
    """Fused forward: pts ``(N, S, 3)``, viewdirs ``(N, 3)`` -> ``(N, S, 4)``.

    Flattens points, pads to a tile multiple, runs the fused kernel with a
    1-D grid of point tiles (weights use a constant index map, so Mosaic
    keeps them VMEM-resident), unpads.
    """
    N, S, _ = pts.shape
    flat = pts.reshape(N * S, 3)
    vd = jnp.broadcast_to(viewdirs[:, None, :], (N, S, 3)).reshape(N * S, 3)
    total = N * S
    pad = (-total) % tile
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
    grid = ((total + pad) // tile,)

    weights = []
    for i in range(8):
        weights += [params["pts"][i]["w"], params["pts"][i]["b"]]
    for name in ("feature", "alpha", "views", "rgb"):
        weights += [params[name]["w"], params[name]["b"]]

    def w_spec(x):
        return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _kernel, cfg.multires, cfg.multires_views, cfg.skips[0]
        ),
        out_shape=jax.ShapeDtypeStruct((total + pad, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [w_spec(x) for x in weights],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(flat, vd, *weights)
    return out[:total].reshape(N, S, 4)
