"""NeRF++ cascaded rendering driver.

Rebuild of the cascade portion of the NeRF++ hot loop
(``/root/reference/nerfplusplus/ddp_train_nerf.py:427-475``): level 0 samples
uniformly (fg: linear in depth from ``min_depth`` to the unit-sphere exit;
bg: linear in inverse depth on [0, 1]); each subsequent level importance-
resamples from the previous level's weights and sort-merges with the previous
depths. Static shapes per level — the per-level sample counts are config.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.nerfpp import NerfPPConfig, nerfpp_forward
from scnerf_tpu.geometry.sphere import intersect_sphere
from scnerf_tpu.sampling.pdf import sample_pdf, sort_last_differentiable
from scnerf_tpu.sampling.stratified import perturb_z_vals


@pytree_dataclass
class NerfPPRenderConfig:
    cascade_samples: tuple = static_field(default=(64, 64))
    perturb: bool = static_field(default=True)
    chunk: int = static_field(default=4096)
    # Sample-chunked remat of MLP queries (see fields/nerf.py rationale).
    # 8 profiled fastest on v5e at N_rand=2048 for both (64,64) and
    # (64,128) cascades (docs/perf_nerfpp.md).
    remat_chunk: int = static_field(default=8)
    # Inverse-CDF implementation. Unlike the NeRF pipeline (which detaches
    # resampled depths, render.py:274), the reference's NeRF++ lets
    # gradients flow through the resample BINS into the camera
    # (ddp_train_nerf.py:459-473 detaches only the weights), so the
    # non-differentiable fused Pallas kernel cannot be the default here.
    # "pallas_stopgrad" opts into it, trading that bin gradient for speed.
    # "pallas_vjp" keeps full gradients: fused Pallas forward + hand-written
    # one-hot VJP (kernels/pdf_pallas.py:sample_pdf_pallas_diff) — gradient-
    # equivalent to the XLA path (A/B measured, docs/perf_nerfpp.md).
    pdf_impl: str = static_field(default="xla")


def render_rays_nerfpp(
    level_params: list,
    model_cfg: NerfPPConfig,
    render_cfg: NerfPPRenderConfig,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    min_depth: jnp.ndarray,
    key,
    rands=None,
):
    """Run all cascade levels; returns the list of per-level outputs.

    Args:
      level_params: one fg/bg param dict per cascade level.
      ray_o, ray_d: ``(N, 3)``.
      min_depth: ``(N,)`` fg near depths (1e-4 default in the reference).
      rands: optional externally-supplied uniforms replacing every random
        draw (trajectory replay of the torch reference's RNG): a sequence
        with one ``(fg, bg)`` pair per cascade level — perturb ``t_rand``
        arrays ``(N, n_samp)`` for level 0, inverse-CDF ``u`` arrays for
        later levels. Ignores ``key`` and ``render_cfg.perturb`` gating for
        the draws it covers.
    """
    n = ray_o.shape[0]
    fg_far = intersect_sphere(ray_o, ray_d)  # (N,)
    outs = []
    fg_depth = bg_depth = None
    ret = None
    for m, n_samp in enumerate(render_cfg.cascade_samples):
        k_fg, k_bg, key = jax.random.split(jax.random.fold_in(key, m), 3)
        r_fg, r_bg = rands[m] if rands is not None else (None, None)
        if m == 0:
            t = jnp.linspace(0.0, 1.0, n_samp)
            fg_depth = min_depth[..., None] * (1.0 - t) + fg_far[..., None] * t
            bg_depth = jnp.broadcast_to(t, (n, n_samp))
            if render_cfg.perturb or r_fg is not None:
                fg_depth = perturb_z_vals(k_fg, fg_depth, t_rand=r_fg)
                bg_depth = perturb_z_vals(k_bg, bg_depth, t_rand=r_bg)
        else:
            if (render_cfg.pdf_impl == "pallas_stopgrad" and rands is None
                    and jax.default_backend() == "tpu"):
                from scnerf_tpu.kernels.pdf_pallas import sample_pdf_pallas

                def _pdf(k, bins, w, n, det, u):
                    return sample_pdf_pallas(
                        k, jax.lax.stop_gradient(bins), w, n, det=det
                    )
            elif render_cfg.pdf_impl == "pallas_vjp":
                # Opt-in (config, not auto): on TPU this is the fused
                # Mosaic kernel; on CPU it requires
                # pltpu.force_tpu_interpret_mode() around the caller
                # (tests/equivalence controls do this).
                from scnerf_tpu.kernels.pdf_pallas import sample_pdf_pallas_diff

                def _pdf(k, bins, w, n, det, u):
                    if u is None:
                        if det:
                            u = jnp.broadcast_to(
                                jnp.linspace(0.0, 1.0, n),
                                bins.shape[:-1] + (n,))
                        else:
                            u = jax.random.uniform(
                                k, bins.shape[:-1] + (n,))
                    return sample_pdf_pallas_diff(bins, w, u, "nerfpp")
            else:
                def _pdf(k, bins, w, n, det, u):
                    return sample_pdf(k, bins, w, n, det=det, u=u,
                                      variant="nerfpp")
            fg_w = jax.lax.stop_gradient(ret["fg_weights"])[..., 1:-1]
            fg_mid = 0.5 * (fg_depth[..., 1:] + fg_depth[..., :-1])
            fg_new = _pdf(k_fg, fg_mid, fg_w, n_samp, not render_cfg.perturb, r_fg)
            fg_depth = sort_last_differentiable(
                jnp.concatenate([fg_depth, fg_new], axis=-1))

            bg_w = jax.lax.stop_gradient(ret["bg_weights"])[..., 1:-1]
            bg_mid = 0.5 * (bg_depth[..., 1:] + bg_depth[..., :-1])
            bg_new = _pdf(k_bg, bg_mid, bg_w, n_samp, not render_cfg.perturb, r_bg)
            bg_depth = sort_last_differentiable(
                jnp.concatenate([bg_depth, bg_new], axis=-1))

        ret = nerfpp_forward(
            level_params[m], model_cfg, ray_o, ray_d, fg_far, fg_depth, bg_depth,
            remat_chunk=render_cfg.remat_chunk,
        )
        outs.append(ret)
    return outs


def render_chunked_nerfpp(
    level_params: list,
    model_cfg: NerfPPConfig,
    render_cfg: NerfPPRenderConfig,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    min_depth: jnp.ndarray,
    key,
):
    """Full-image render via ``lax.map`` over fixed-size chunks; returns only
    the last cascade level's maps (what the reference logs/saves)."""
    n = ray_o.shape[0]
    chunk = min(render_cfg.chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def _pad(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), mode="edge")

    ro = _pad(ray_o).reshape(n_chunks, chunk, 3)
    rd = _pad(ray_d).reshape(n_chunks, chunk, 3)
    md = _pad(min_depth).reshape(n_chunks, chunk)
    keys = jax.random.split(key, n_chunks)

    def body(args):
        ro_c, rd_c, md_c, k = args
        outs = render_rays_nerfpp(
            level_params, model_cfg, render_cfg, ro_c, rd_c, md_c, k
        )
        last = outs[-1]
        return {
            "rgb": last["rgb"],
            "fg_rgb": last["fg_rgb"],
            "bg_rgb": last["bg_rgb"],
            "fg_depth": last["fg_depth"],
            "bg_depth": last["bg_depth"],
            "bg_lambda": last["bg_lambda"],
        }

    out = jax.lax.map(body, (ro, rd, md, keys))
    return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}
