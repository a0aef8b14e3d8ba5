"""NeRF++ scene representation: foreground + inverted-sphere background.

Rebuild of ``MLPNet`` (``/root/reference/nerfplusplus/nerf_network.py:70-142``)
and ``NerfNet``/``NerfNetWithAutoExpo``
(``/root/reference/nerfplusplus/ddp_model.py:48-188``):

- fg net consumes 3D points inside the unit sphere; bg net consumes the
  4D ``(x', y', z', 1/r)`` inverted-sphere parameterization.
- sigma activation is ``abs`` (``nerf_network.py:133-134``), rgb is sigmoid.
- compositing: fg transmittance leftover ``bg_lambda`` scales the bg render
  (``ddp_model.py:100-133``); bg samples are processed in flipped depth order.
- auto-exposure: per-image learnable ``(scale_raw, shift)``; effective scale
  is ``|scale_raw| + 0.5`` (``ddp_model.py:180-187``). Stored as an ``(N, 2)``
  array indexed by image id instead of a name-keyed ParameterDict.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
from scnerf_tpu.fields.mlp import dense, init_dense
from scnerf_tpu.geometry.sphere import HUGE_NUMBER, TINY_NUMBER, depth2pts_outside


@pytree_dataclass
class NerfPPConfig:
    depth: int = static_field(default=8)
    width: int = static_field(default=256)
    skips: tuple = static_field(default=(4,))
    use_viewdirs: bool = static_field(default=True)
    max_freq_log2: int = static_field(default=10)  # N_freqs for positions
    max_freq_log2_viewdirs: int = static_field(default=4)
    compute_dtype: str = static_field(default="float32")
    # Run the fg and bg MLPs as ONE batched remat scan per cascade level
    # (halves the scan trip count; the per-trip matmuls become 2-batched).
    # Numerically equivalent to the sequential path up to f32 reassociation
    # — the fg net is embedded in the bg's 4-D encoding layout with zero
    # rows/masked features (see stack_fgbg_params).
    fuse_fgbg: bool = static_field(default=False)

    def pos_encoding(self, input_dim: int) -> EncodingConfig:
        return EncodingConfig(input_dim=input_dim, n_freqs=self.max_freq_log2)

    @property
    def view_encoding(self) -> EncodingConfig:
        return EncodingConfig(input_dim=3, n_freqs=self.max_freq_log2_viewdirs)

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def init_mlpnet(key, cfg: NerfPPConfig, input_dim: int):
    """One MLPNet (fg or bg flavor, chosen by ``input_dim`` 3 or 4)."""
    input_ch = cfg.pos_encoding(input_dim).out_dim
    view_ch = cfg.view_encoding.out_dim
    keys = jax.random.split(key, cfg.depth + 4)
    base = []
    dim = input_ch
    for i in range(cfg.depth):
        base.append(init_dense(keys[i], dim, cfg.width, "relu"))
        dim = cfg.width
        if i in cfg.skips and i != cfg.depth - 1:
            dim += input_ch
    return {
        "base": base,
        "sigma": init_dense(keys[cfg.depth], dim, 1, "linear"),
        "remap": init_dense(keys[cfg.depth + 1], dim, 256, "linear"),
        "rgb0": init_dense(keys[cfg.depth + 2], 256 + view_ch, cfg.width // 2, "relu"),
        "rgb1": init_dense(keys[cfg.depth + 3], cfg.width // 2, 3, "linear"),
    }


def mlpnet_apply(params, cfg: NerfPPConfig, pts_enc, views_enc):
    """Returns (rgb in [0,1] ``(..., 3)``, sigma >= 0 ``(...,)``)."""
    cd = cfg.cdtype
    h = jax.nn.relu(dense(params["base"][0], pts_enc, cd))
    for i in range(cfg.depth - 1):
        if i in cfg.skips:
            h = jnp.concatenate([pts_enc.astype(h.dtype), h], axis=-1)
        h = jax.nn.relu(dense(params["base"][i + 1], h, cd))
    sigma = jnp.abs(dense(params["sigma"], h, cd))[..., 0]
    remap = dense(params["remap"], h, cd)
    hv = jnp.concatenate([remap, views_enc.astype(remap.dtype)], axis=-1)
    hv = jax.nn.relu(dense(params["rgb0"], hv, cd))
    rgb = jax.nn.sigmoid(dense(params["rgb1"], hv, cd))
    return rgb, sigma


def mlpnet_apply_chunked(params, cfg: NerfPPConfig, pts_enc, views_enc, chunk: int):
    """Sample-chunked remat variant of :func:`mlpnet_apply` (same HBM-
    bandwidth rationale as ``fields/nerf.py:query_field_chunked``)."""
    S = pts_enc.shape[-2]
    if chunk <= 0 or S % chunk != 0 or S == chunk:
        return mlpnet_apply(params, cfg, pts_enc, views_enc)
    n_chunks = S // chunk
    lead = pts_enc.shape[:-2]

    def to_chunks(x):
        return jnp.moveaxis(x.reshape(*lead, n_chunks, chunk, x.shape[-1]), -3, 0)

    apply_fn = jax.checkpoint(lambda p, pe, ve: mlpnet_apply(p, cfg, pe, ve))

    def body(_, xs):
        pe, ve = xs
        return None, apply_fn(params, pe, ve)

    _, (rgb, sigma) = jax.lax.scan(body, None, (to_chunks(pts_enc), to_chunks(views_enc)))
    rgb = jnp.moveaxis(rgb, 0, -3).reshape(*lead, S, 3)
    sigma = jnp.moveaxis(sigma, 0, -2).reshape(*lead, S)
    return rgb, sigma


def query_mlpnet_chunked(params, cfg: NerfPPConfig, pts, views_enc,
                         chunk: int, input_dim: int):
    """PE + MLP with the positional encoding INSIDE the rematerialised
    chunk body.

    :func:`mlpnet_apply_chunked` keeps the encodings as scan inputs, so the
    full ``(N, S, 63|87)`` f32 encoding tensors round-trip HBM between the
    forward and backward passes. Here only the raw ``(N, S, 3|4)`` points
    are carried; the encoding (and the per-sample viewdir broadcast) is
    recomputed in the checkpointed body — ~20x less activation traffic for
    a few extra VPU sin/cos per backward chunk.

    Args:
      pts: ``(N, S, input_dim)`` raw sample points.
      views_enc: ``(N, Cv)`` encoded viewdirs (broadcast per chunk inside).
    """
    S = pts.shape[-2]
    enc_cfg = cfg.pos_encoding(input_dim)

    def apply_raw(p, pts_c, ve):
        pe = positional_encoding(pts_c, enc_cfg)
        ve_b = jnp.broadcast_to(ve[..., None, :], pe.shape[:-1] + (ve.shape[-1],))
        return mlpnet_apply(p, cfg, pe, ve_b)

    if chunk <= 0 or S % chunk != 0 or S == chunk:
        return apply_raw(params, pts, views_enc)
    n_chunks = S // chunk
    lead = pts.shape[:-2]
    pts_c = jnp.moveaxis(pts.reshape(*lead, n_chunks, chunk, pts.shape[-1]), -3, 0)
    # prevent_cse=False is safe (body only runs inside the scan below) and
    # measured +3% on the NeRF step — see query_field_chunked.
    apply_fn = jax.checkpoint(apply_raw, prevent_cse=False)

    def body(_, xs):
        return None, apply_fn(params, xs, views_enc)

    _, (rgb, sigma) = jax.lax.scan(body, None, pts_c)
    rgb = jnp.moveaxis(rgb, 0, -3).reshape(*lead, S, 3)
    sigma = jnp.moveaxis(sigma, 0, -2).reshape(*lead, S)
    return rgb, sigma


def _fg_feature_index(cfg: NerfPPConfig):
    """Positions of the fg net's 3-D PE features inside the 4-D PE layout.

    ``positional_encoding`` emits per-block features — ``[x (D), sin(f0 x)
    (D), cos(f0 x) (D), sin(f1 x) (D), ...]`` — so the 3-D encoding is a
    fixed subset of the 4-D one: block ``b`` feature ``d`` lives at
    ``b*4 + d``. Returns an int array of length ``pos_encoding(3).out_dim``.
    """
    import numpy as np

    d3 = cfg.pos_encoding(3).out_dim
    n_blocks = d3 // 3
    assert cfg.pos_encoding(4).out_dim == n_blocks * 4
    return np.asarray([b * 4 + d for b in range(n_blocks) for d in range(3)])


def stack_fgbg_params(params, cfg: NerfPPConfig):
    """Stack the fg and bg MLPNet params into one tree with leading axis 2.

    The fg net's input-consuming weight rows (layer 0 and the post-skip
    layers) are scattered into the 4-D encoding layout with zero rows at
    the 4th-dim feature positions; together with :func:`_fg_feature_mask`
    zeroing those features, the fused apply reproduces the sequential fg
    output exactly (zero features x any weight, zero weights x the padded
    dim's sin/cos). Gradients transpose back through the scatter onto the
    original ``params['fg']`` leaves, so optimizer/checkpoint layouts are
    untouched.
    """
    fg, bg = params["fg"], params["bg"]
    d3 = cfg.pos_encoding(3).out_dim
    d4 = cfg.pos_encoding(4).out_dim
    idx = jnp.asarray(_fg_feature_index(cfg))

    def scatter_rows(w):
        out = jnp.zeros((d4 + (w.shape[0] - d3), w.shape[1]), w.dtype)
        out = out.at[idx].set(w[:d3])
        if w.shape[0] > d3:
            out = out.at[d4:].set(w[d3:])
        return out

    base = []
    for i in range(cfg.depth):
        wf = fg["base"][i]["w"]
        if i == 0 or (i - 1) in cfg.skips:
            wf = scatter_rows(wf)
        base.append({
            "w": jnp.stack([wf, bg["base"][i]["w"]]),
            "b": jnp.stack([fg["base"][i]["b"], bg["base"][i]["b"]]),
        })
    stacked = {"base": base}
    for head in ("sigma", "remap", "rgb0", "rgb1"):
        stacked[head] = {
            "w": jnp.stack([fg[head]["w"], bg[head]["w"]]),
            "b": jnp.stack([fg[head]["b"], bg[head]["b"]]),
        }
    return stacked


def _fg_feature_mask(cfg: NerfPPConfig):
    """(2, d4) multiplier: row 0 zeroes the 4th-dim features (fg), row 1 is
    all-ones (bg)."""
    import numpy as np

    d4 = cfg.pos_encoding(4).out_dim
    m = np.zeros((d4,), np.float32)
    m[_fg_feature_index(cfg)] = 1.0
    return jnp.asarray(np.stack([m, np.ones_like(m)]))


def query_fused_chunked(stacked, cfg: NerfPPConfig, pts2, views_enc, chunk: int):
    """Fused fg+bg sample-chunked remat query.

    One ``lax.scan`` serves both nets: each trip runs the 8-layer MLP as
    2-batched matmuls over ``(2, N*chunk, ·)`` operands instead of two
    separate scans — half the trip count of the sequential path for the
    same FLOPs (the NeRF++ step spends ~22% of device time on VMEM writes
    at chunk boundaries, docs/perf_nerfpp.md).

    Args:
      stacked: tree from :func:`stack_fgbg_params`.
      pts2: ``(2, N, S, 4)`` raw points — fg zero-padded to 4-D in row 0,
        bg inverted-sphere points in row 1.
      views_enc: ``(N, Cv)`` encoded viewdirs (shared by both nets).
    Returns:
      (rgb ``(2, N, S, 3)``, sigma ``(2, N, S)``).
    """
    S = pts2.shape[-2]
    enc_cfg = cfg.pos_encoding(4)
    mask = _fg_feature_mask(cfg)

    def apply_raw(p, pts_c, ve):
        pe = positional_encoding(pts_c, enc_cfg) * mask[:, None, None, :]
        ve_b = jnp.broadcast_to(
            ve[None, :, None, :], pe.shape[:-1] + (ve.shape[-1],)
        )
        return jax.vmap(lambda pn, pen, ven: mlpnet_apply(pn, cfg, pen, ven))(
            p, pe, ve_b
        )

    if chunk <= 0 or S % chunk != 0 or S == chunk:
        return apply_raw(stacked, pts2, views_enc)
    n_chunks = S // chunk
    n = pts2.shape[1]
    pts_c = jnp.moveaxis(
        pts2.reshape(2, n, n_chunks, chunk, pts2.shape[-1]), 2, 0
    )
    apply_fn = jax.checkpoint(apply_raw, prevent_cse=False)

    def body(_, xs):
        return None, apply_fn(stacked, xs, views_enc)

    _, (rgb, sigma) = jax.lax.scan(body, None, pts_c)
    rgb = jnp.moveaxis(rgb, 0, -3).reshape(2, n, S, 3)
    sigma = jnp.moveaxis(sigma, 0, -2).reshape(2, n, S)
    return rgb, sigma


def init_nerfpp_net(key, cfg: NerfPPConfig, n_images: int = 0, autoexpo: bool = False):
    k_fg, k_bg = jax.random.split(key)
    params = {
        "fg": init_mlpnet(k_fg, cfg, input_dim=3),
        "bg": init_mlpnet(k_bg, cfg, input_dim=4),
    }
    if autoexpo:
        # (scale_raw=0.5, shift=0) per image (ddp_model.py:169).
        ae = jnp.tile(jnp.asarray([[0.5, 0.0]], jnp.float32), (n_images, 1))
        params["autoexpo"] = ae
    return params


def nerfpp_forward(
    params,
    cfg: NerfPPConfig,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    fg_z_max: jnp.ndarray,
    fg_z_vals: jnp.ndarray,
    bg_z_vals: jnp.ndarray,
    remat_chunk: int = 0,
):
    """Joint fg/bg render of one cascade level (``ddp_model.py:74-143``).

    Args:
      ray_o, ray_d: ``(N, 3)``.
      fg_z_max: ``(N,)`` depth of the unit-sphere exit point.
      fg_z_vals: ``(N, S_fg)`` fg sample depths.
      bg_z_vals: ``(N, S_bg)`` bg inverse depths in [0, 1].
    Returns:
      dict: rgb, fg_weights, bg_weights, fg_rgb, fg_depth, bg_rgb, bg_depth,
      bg_lambda.
    """
    ray_d_norm = jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdirs = ray_d / ray_d_norm
    views_enc = positional_encoding(viewdirs, cfg.view_encoding)

    fuse = cfg.fuse_fgbg and fg_z_vals.shape == bg_z_vals.shape

    # ---- foreground
    fg_pts = ray_o[..., None, :] + fg_z_vals[..., None] * ray_d[..., None, :]
    if not fuse:
        fg_rgb, fg_sigma = query_mlpnet_chunked(
            params["fg"], cfg, fg_pts, views_enc, remat_chunk, input_dim=3
        )

    # Background points (inverted sphere; flipped far -> near before the
    # encode — PE is per-sample so flip-then-encode == encode-then-flip).
    bg_pts, _ = depth2pts_outside(
        jnp.broadcast_to(ray_o[..., None, :], bg_z_vals.shape + (3,)),
        jnp.broadcast_to(ray_d[..., None, :], bg_z_vals.shape + (3,)),
        bg_z_vals,
    )
    bg_pts = jnp.flip(bg_pts, axis=-2)

    if fuse:
        pts2 = jnp.stack(
            [jnp.concatenate([fg_pts, jnp.zeros_like(fg_pts[..., :1])], -1),
             bg_pts]
        )
        rgb2, sigma2 = query_fused_chunked(
            stack_fgbg_params(params, cfg), cfg, pts2, views_enc, remat_chunk
        )
        fg_rgb, bg_rgb = rgb2[0], rgb2[1]
        fg_sigma, bg_sigma = sigma2[0], sigma2[1]

    fg_dists = fg_z_vals[..., 1:] - fg_z_vals[..., :-1]
    fg_dists = ray_d_norm * jnp.concatenate(
        [fg_dists, (fg_z_max[..., None] - fg_z_vals[..., -1:])], axis=-1
    )
    fg_alpha = 1.0 - jnp.exp(-fg_sigma * fg_dists)
    T = jnp.cumprod(1.0 - fg_alpha + TINY_NUMBER, axis=-1)
    bg_lambda = T[..., -1]
    T = jnp.concatenate([jnp.ones_like(T[..., :1]), T[..., :-1]], axis=-1)
    fg_weights = fg_alpha * T
    fg_rgb_map = jnp.sum(fg_weights[..., None] * fg_rgb, axis=-2)
    fg_depth_map = jnp.sum(fg_weights * fg_z_vals, axis=-1)

    # ---- background (inverted sphere; processed far -> near)
    bg_z_flip = jnp.flip(bg_z_vals, axis=-1)  # 1 -> 0
    bg_dists = bg_z_flip[..., :-1] - bg_z_flip[..., 1:]
    bg_dists = jnp.concatenate(
        [bg_dists, jnp.full_like(bg_dists[..., :1], HUGE_NUMBER)], axis=-1
    )
    if not fuse:
        bg_rgb, bg_sigma = query_mlpnet_chunked(
            params["bg"], cfg, bg_pts, views_enc, remat_chunk, input_dim=4
        )
    bg_alpha = 1.0 - jnp.exp(-bg_sigma * bg_dists)
    T = jnp.cumprod(1.0 - bg_alpha + TINY_NUMBER, axis=-1)[..., :-1]
    T = jnp.concatenate([jnp.ones_like(T[..., :1]), T], axis=-1)
    bg_weights = bg_alpha * T
    bg_rgb_map = jnp.sum(bg_weights[..., None] * bg_rgb, axis=-2)
    bg_depth_map = jnp.sum(bg_weights * bg_z_flip, axis=-1)

    bg_rgb_map = bg_lambda[..., None] * bg_rgb_map
    bg_depth_map = bg_lambda * bg_depth_map
    rgb_map = fg_rgb_map + bg_rgb_map
    return {
        "rgb": rgb_map,
        "fg_weights": fg_weights,
        "bg_weights": bg_weights,
        "fg_rgb": fg_rgb_map,
        "fg_depth": fg_depth_map,
        "bg_rgb": bg_rgb_map,
        "bg_depth": bg_depth_map,
        "bg_lambda": bg_lambda,
    }


def autoexpo_params(params, img_idx):
    """Effective (scale, shift) for an image (``ddp_model.py:183-186``)."""
    ae = params["autoexpo"][img_idx]
    return jnp.abs(ae[..., 0]) + 0.5, ae[..., 1]
