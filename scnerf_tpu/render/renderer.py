"""Coarse-to-fine volume renderer (NeRF pipeline).

Rebuild of ``render_rays``/``batchify_rays``/``render``
(``/root/reference/NeRF/render.py:18-300,398-413``), redesigned for XLA:

- one pure jittable function over a fixed-size ray batch — no per-chunk
  Python loop inside the step;
- full-image rendering is ``jax.lax.map`` over static-size chunks inside a
  single jit (the chunking bounds VMEM/HBM working-set, the loop is compiled);
- hierarchical resampling uses the compare-and-sum inverse CDF
  (:mod:`scnerf_tpu.sampling.pdf`);
- randomness from explicit keys, foldable per device/step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.nerf import NeRFConfig, query_field_chunked
from scnerf_tpu.render.composite import raw2outputs
from scnerf_tpu.sampling.pdf import sample_pdf
from scnerf_tpu.sampling.stratified import stratified_z_vals


@pytree_dataclass
class RenderConfig:
    n_samples: int = static_field(default=64)
    n_importance: int = static_field(default=64)
    perturb: bool = static_field(default=True)
    lindisp: bool = static_field(default=False)
    raw_noise_std: float = static_field(default=0.0)
    white_bkgd: bool = static_field(default=False)
    use_viewdirs: bool = static_field(default=True)
    near: float = static_field(default=0.0)
    far: float = static_field(default=1.0)
    chunk: int = static_field(default=8192)  # full-image render chunk
    # Inverse-CDF implementation: "auto" uses the fused Pallas kernel on TPU
    # and the XLA path elsewhere; "xla" / "pallas" force one.
    pdf_impl: str = static_field(default="auto")
    # Sample-chunked rematerialized field queries (0 = off). Cuts the HBM
    # traffic of stored MLP activations in the backward pass; see
    # fields/nerf.py:query_field_chunked.
    remat_chunk: int = static_field(default=16)
    # Store the remat-boundary residuals in bf16 (A/B lever for the
    # HBM-bound step; measured in docs/perf_nerf.md — not a default).
    remat_stash_bf16: bool = static_field(default=False)

    def eval_mode(self) -> "RenderConfig":
        """Test-time overrides (``create_nerf.py:86-90``): no jitter/noise."""
        return self.replace(perturb=False, raw_noise_std=0.0)


def render_rays(
    params: dict,
    model_cfg: NeRFConfig,
    render_cfg: RenderConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray | None,
    near,
    far,
    key,
    rands: dict | None = None,
) -> dict[str, Any]:
    """Render a batch of rays with the coarse(+fine) cascade.

    Args:
      params: ``{"coarse": mlp_params, "fine": mlp_params | None}``.
      rays_o, rays_d: ``(N, 3)`` (possibly NDC-warped).
      viewdirs: ``(N, 3)`` unit world-space view directions or None.
      near, far: scalars or ``(N,)``.
      key: PRNG key.
      rands: optional externally-drawn randoms for exact replay of the
        reference's torch stream (trajectory-parity harness). Keys:
        ``t`` (N, S) perturb uniforms, ``noise0`` (N, S) and ``noise1``
        (N, S+S_imp) standard normals for the sigma regularizer, ``u``
        (N, S_imp) inverse-CDF uniforms. Any subset may be given.
    Returns:
      dict: rgb, disp, acc, depth (+ rgb0/disp0/acc0/z_std when fine active).
    """
    n = rays_o.shape[0]
    rands = rands or {}
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n,))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n,))
    k_strat, k_pdf, k_noise0, k_noise1 = jax.random.split(key, 4)

    z_vals = stratified_z_vals(
        k_strat, near, far, render_cfg.n_samples,
        lindisp=render_cfg.lindisp, perturb=render_cfg.perturb,
        t_rand=rands.get("t"),
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = query_field_chunked(
        params["coarse"], model_cfg, pts, viewdirs, render_cfg.remat_chunk,
        stash_bf16=render_cfg.remat_stash_bf16,
    )
    coarse = raw2outputs(
        raw, z_vals, rays_d,
        raw_noise_std=render_cfg.raw_noise_std,
        white_bkgd=render_cfg.white_bkgd,
        noise_key=k_noise0,
        noise=rands.get("noise0"),
    )

    out = {
        "rgb": coarse["rgb"],
        "disp": coarse["disp"],
        "acc": coarse["acc"],
        "depth": coarse["depth"],
    }
    if render_cfg.n_importance > 0:
        # Resampling is gradient-stopped in the reference (render.py:274);
        # stopping the *inputs* is equivalent and keeps the Pallas kernel
        # outside the autodiff graph entirely.
        z_mid = jax.lax.stop_gradient(0.5 * (z_vals[..., 1:] + z_vals[..., :-1]))
        w_mid = jax.lax.stop_gradient(coarse["weights"][..., 1:-1])
        impl = render_cfg.pdf_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if "u" in rands:
            impl = "xla"  # the Pallas kernel has no u-injection path
        if impl == "pallas":
            from scnerf_tpu.kernels.pdf_pallas import sample_pdf_pallas

            z_samples = sample_pdf_pallas(
                k_pdf, z_mid, w_mid,
                render_cfg.n_importance, det=not render_cfg.perturb,
            )
        else:
            z_samples = sample_pdf(
                k_pdf, z_mid, w_mid,
                render_cfg.n_importance, det=not render_cfg.perturb,
                u=rands.get("u"),
            )
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
        fine_params = params.get("fine") or params["coarse"]
        raw = query_field_chunked(
            fine_params, model_cfg, pts, viewdirs, render_cfg.remat_chunk,
            stash_bf16=render_cfg.remat_stash_bf16,
        )
        fine = raw2outputs(
            raw, z_all, rays_d,
            raw_noise_std=render_cfg.raw_noise_std,
            white_bkgd=render_cfg.white_bkgd,
            noise_key=k_noise1,
            noise=rands.get("noise1"),
        )
        out.update(
            rgb=fine["rgb"], disp=fine["disp"], acc=fine["acc"], depth=fine["depth"],
            rgb0=coarse["rgb"], disp0=coarse["disp"], acc0=coarse["acc"],
            z_std=jnp.std(z_samples, axis=-1),
        )
    return out


def render_chunked(
    params: dict,
    model_cfg: NeRFConfig,
    render_cfg: RenderConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray | None,
    near,
    far,
    key,
) -> dict[str, Any]:
    """Full-image (or any large-batch) render via ``lax.map`` over chunks.

    Pads the ray count to a chunk multiple (the shard/chunk invariant the
    reference enforces by crashing, ``ddp_train_nerf.py:144-146``, is handled
    by pad-and-mask here), maps the per-chunk renderer, unpads.
    """
    n = rays_o.shape[0]
    chunk = min(render_cfg.chunk, n) if n > 0 else render_cfg.chunk
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def _pad(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), mode="edge")

    ro = _pad(rays_o).reshape(n_chunks, chunk, 3)
    rd = _pad(rays_d).reshape(n_chunks, chunk, 3)
    vd = _pad(viewdirs).reshape(n_chunks, chunk, 3) if viewdirs is not None else None
    nr = _pad(jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n,))).reshape(n_chunks, chunk)
    fr = _pad(jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n,))).reshape(n_chunks, chunk)
    keys = jax.random.split(key, n_chunks)

    if vd is not None:
        def body(args):
            ro_c, rd_c, vd_c, nr_c, fr_c, k = args
            return render_rays(
                params, model_cfg, render_cfg, ro_c, rd_c, vd_c, nr_c, fr_c, k
            )

        xs = (ro, rd, vd, nr, fr, keys)
    else:
        def body(args):
            ro_c, rd_c, nr_c, fr_c, k = args
            return render_rays(
                params, model_cfg, render_cfg, ro_c, rd_c, None, nr_c, fr_c, k
            )

        xs = (ro, rd, nr, fr, keys)
    out = jax.lax.map(body, xs)
    return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}
