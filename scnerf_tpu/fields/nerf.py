"""The NeRF scene MLP (coarse/fine), functional.

Rebuild of the ``NeRF`` module (``/root/reference/NeRF/run_nerf_helpers.py:
76-128``): D=8, W=256, skip concat of the encoded position after layer 4,
viewdirs head (feature -> [feature, viewdir-enc] -> W//2 -> rgb; alpha from
the trunk). Output is raw ``[rgb_logits(3), sigma(1)]`` — activations are
applied by the compositor, exactly as in the reference.

TPU-first: the forward is a chain of large (B, 256) x (256, 256) matmuls that
tile straight onto the MXU; positional encoding is fused in by XLA. Params
are a plain pytree; one ``vmap``-free batched call handles all samples of all
rays at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
from scnerf_tpu.fields.mlp import dense, init_dense


@pytree_dataclass
class NeRFConfig:
    depth: int = static_field(default=8)
    width: int = static_field(default=256)
    skips: tuple = static_field(default=(4,))
    use_viewdirs: bool = static_field(default=True)
    multires: int = static_field(default=10)
    multires_views: int = static_field(default=4)
    output_ch: int = static_field(default=4)  # only used when not use_viewdirs
    compute_dtype: str = static_field(default="float32")  # "bfloat16" on TPU

    @property
    def pos_encoding(self) -> EncodingConfig:
        return EncodingConfig(input_dim=3, n_freqs=self.multires)

    @property
    def view_encoding(self) -> EncodingConfig:
        return EncodingConfig(input_dim=3, n_freqs=self.multires_views)

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def init_nerf_mlp(key, cfg: NeRFConfig):
    """Parameter pytree for one NeRF MLP."""
    input_ch = cfg.pos_encoding.out_dim
    input_ch_views = cfg.view_encoding.out_dim
    keys = jax.random.split(key, cfg.depth + 5)
    pts = []
    in_dim = input_ch
    for i in range(cfg.depth):
        pts.append(init_dense(keys[i], in_dim, cfg.width, "relu"))
        # Skip concat happens after layer i in skips -> next layer widens.
        in_dim = cfg.width + input_ch if i in cfg.skips else cfg.width
    params = {"pts": pts}
    if cfg.use_viewdirs:
        params["feature"] = init_dense(keys[cfg.depth], cfg.width, cfg.width, "linear")
        params["alpha"] = init_dense(keys[cfg.depth + 1], cfg.width, 1, "linear")
        params["views"] = init_dense(
            keys[cfg.depth + 2], input_ch_views + cfg.width, cfg.width // 2, "relu"
        )
        params["rgb"] = init_dense(keys[cfg.depth + 3], cfg.width // 2, 3, "linear")
    else:
        params["output"] = init_dense(keys[cfg.depth], cfg.width, cfg.output_ch, "linear")
    return params


def nerf_mlp_apply(params, cfg: NeRFConfig, pts_enc: jnp.ndarray, views_enc=None):
    """Raw field query on *already encoded* inputs.

    Args:
      pts_enc: ``(..., pos_out_dim)``.
      views_enc: ``(..., view_out_dim)`` (required iff ``use_viewdirs``).
    Returns:
      ``(..., 4)`` raw ``[r, g, b, sigma]`` (pre-activation).
    """
    cd = cfg.cdtype
    h = pts_enc
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(dense(layer, h, cd))
        if i in cfg.skips:
            h = jnp.concatenate([pts_enc.astype(h.dtype), h], axis=-1)
    if cfg.use_viewdirs:
        alpha = dense(params["alpha"], h, cd)
        feature = dense(params["feature"], h, cd)
        h = jnp.concatenate([feature, views_enc.astype(feature.dtype)], axis=-1)
        h = jax.nn.relu(dense(params["views"], h, cd))
        rgb = dense(params["rgb"], h, cd)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return dense(params["output"], h, cd)


def query_field(params, cfg: NeRFConfig, pts: jnp.ndarray, viewdirs=None):
    """Encode positions/viewdirs and query the MLP.

    Args:
      pts: ``(N, S, 3)`` sample positions.
      viewdirs: ``(N, 3)`` unit view directions (broadcast over samples).
    Returns:
      ``(N, S, 4)`` raw outputs.
    """
    pts_enc = positional_encoding(pts, cfg.pos_encoding)
    views_enc = None
    if cfg.use_viewdirs:
        vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
        views_enc = positional_encoding(vd, cfg.view_encoding)
    return nerf_mlp_apply(params, cfg, pts_enc, views_enc)


def query_field_chunked(params, cfg: NeRFConfig, pts, viewdirs, chunk: int,
                        stash_bf16: bool = False):
    """Query in sample-chunks via ``lax.scan`` + ``jax.checkpoint``.

    HBM-bandwidth optimization: the plain backward pass streams every stored
    layer activation ((N*S, 256) x ~12 layers) through HBM, making the
    backward ~5x the forward cost. Rematerializing per sample-chunk keeps the
    live activation working set small (recomputed adjacent to its use), which
    measured ~35% faster fwd+bwd on v5e at the fern workload. Sample chunks
    are valid because samples are independent until compositing.

    ``stash_bf16`` casts the checkpoint-boundary residuals (the per-chunk
    sample coordinates) to bf16, halving the stash traffic; the recompute
    upcasts before the positional encoding so MLP compute stays f32. The
    coordinate quantization (~3 decimal digits) feeds sin/cos of up to
    2^9 * x, so high-frequency PE bands see O(0.1) phase noise — measured
    A/B in docs/perf_nerf.md before considering it for defaults.
    """
    N, S, _ = pts.shape
    if chunk <= 0 or S % chunk != 0 or S == chunk:
        return query_field(params, cfg, pts, viewdirs)
    n_chunks = S // chunk
    chunks = pts.reshape(N, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    # prevent_cse=False: the checkpointed body only ever runs inside the
    # lax.scan below, where CSE across the remat boundary cannot happen
    # anyway (jax docs); lifting the restriction frees XLA's scheduler —
    # measured +3% on the fern step (scripts/ab_step_levers.py).
    if stash_bf16:
        chunks = chunks.astype(jnp.bfloat16)
        vds = viewdirs.astype(jnp.bfloat16) if viewdirs is not None else None
        qf = jax.checkpoint(
            lambda p, x, v: query_field(
                p, cfg, x.astype(jnp.float32),
                v.astype(jnp.float32) if v is not None else None),
            prevent_cse=False)
    else:
        vds = viewdirs
        qf = jax.checkpoint(lambda p, x, v: query_field(p, cfg, x, v),
                            prevent_cse=False)

    def body(_, pts_c):
        return None, qf(params, pts_c, vds)

    _, raws = jax.lax.scan(body, None, chunks)  # (n_chunks, N, chunk, C)
    return raws.transpose(1, 0, 2, 3).reshape(N, S, raws.shape[-1])
