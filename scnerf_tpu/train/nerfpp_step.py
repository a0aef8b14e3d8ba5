"""NeRF++ compiled train step (the multi-chip flagship pipeline).

Rebuild of the per-rank body of ``/root/reference/nerfplusplus/
ddp_train_nerf.py:382-556`` as one pure jitted function: cascade levels,
per-level MSE (with optional auto-exposure correction + regularizer,
``:478-489``), optional PRD on the last level (``:491-550``), single backward,
Adam. Under ``shard_map``/``pjit`` the ray batch shards over the mesh and
gradients — **including the camera's** — are summed across chips, fixing the
reference's silent per-rank camera divergence (SURVEY.md section 3.5 note).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from scnerf_tpu.camera.model import Camera, get_extrinsic, get_intrinsic
from scnerf_tpu.camera.rays import pixels_to_rays
from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.nerfpp import NerfPPConfig, autoexpo_params
from scnerf_tpu.losses.photometric import img2mse, masked_mse, mse2psnr
from scnerf_tpu.losses.prd import prd_loss
from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig, render_rays_nerfpp
from scnerf_tpu.train.curriculum import Curriculum, mask_tree_camera_grads, prd_active
from scnerf_tpu.train.step import TrainState


@pytree_dataclass
class NerfPPTrainConfig:
    lr_init: float = static_field(default=5e-4)
    lr_decay_steps: float = static_field(default=750_000)
    lr_decay_factor: float = static_field(default=0.1)
    weight_decay: float = static_field(default=0.0)
    autoexpo: bool = static_field(default=False)
    # reference default (nerfplusplus/config_argparser.py:48)
    lambda_autoexpo: float = static_field(default=1.0)
    prd_threshold: float = static_field(default=5.0)
    # Distortion-aware PRD: map projections through the inverse-distortion
    # lookup before comparing to keypoints (losses/prd.py docstring). The
    # reference left this path commented out (ray_dist_loss.py:188-199) —
    # off by default for parity; enabling makes radial k observable via PRD.
    prd_undistort: bool = static_field(default=False)


def make_nerfpp_train_step(
    model_cfg: NerfPPConfig,
    render_cfg: NerfPPRenderConfig,
    train_cfg: NerfPPTrainConfig,
    curriculum: Curriculum,
    tx: optax.GradientTransformation,
    with_prd: bool = False,
    donate: bool = True,
):
    """Jitted step over a batch:

    ``batch`` keys: either precomputed ``rays_o``/``rays_d`` or pixel requests
    ``px``/``py`` + scalar ``img_idx``; ``target`` ``(N, 3)``; ``min_depth``
    ``(N,)``; optional ``mask``; optional ``rands`` (per-level uniform
    overrides for RNG replay, see ``render_rays_nerfpp``); with PRD:
    ``kps0``/``kps1``/``kp_mask``/``pair_idx``.
    """

    def loss_fn(params, batch, key, step):
        camera: Camera | None = params.get("camera")
        if "rays_o" in batch:
            rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        else:
            rays_o, rays_d = pixels_to_rays(
                camera, batch["px"], batch["py"], image_idx=batch["img_idx"]
            )
        outs = render_rays_nerfpp(
            params["levels"], model_cfg, render_cfg,
            rays_o, rays_d, batch["min_depth"], key,
            rands=batch.get("rands"),
        )
        target = batch["target"]
        mask = batch.get("mask")
        loss = 0.0
        metrics = {}
        for m, ret in enumerate(outs):
            if train_cfg.autoexpo:
                scale, shift = autoexpo_params(params["levels"][m], batch["img_idx"])
                scale = scale[..., None] if scale.ndim else scale
                shift = shift[..., None] if jnp.ndim(shift) else shift
                pred = (ret["rgb"] - shift) / scale
                mse = img2mse(pred, target) if mask is None else masked_mse(pred, target, mask)
                loss = loss + mse + train_cfg.lambda_autoexpo * (
                    jnp.mean(jnp.abs(scale - 1.0)) + jnp.mean(jnp.abs(shift))
                )
            else:
                mse = (
                    img2mse(ret["rgb"], target)
                    if mask is None
                    else masked_mse(ret["rgb"], target, mask)
                )
                loss = loss + mse
            metrics[f"mse_{m}"] = mse
        metrics["psnr"] = mse2psnr(metrics[f"mse_{len(outs) - 1}"])

        if with_prd:
            assert camera is not None
            i0, i1 = batch["pair_idx"][0], batch["pair_idx"][1]
            # Reference kps handling (ddp_train_nerf.py:524-529): rays are
            # cast at the TRUNCATED pixel (float kps -> .long() flat index,
            # +0.5 center added inside ray gen / our OPENCV pixel_offset),
            # while the loss targets are the float kps + 0.5. We floor each
            # coordinate; the reference floors the flattened y*W + x, which
            # is equivalent for the integer-valued SuperGlue keypoints it
            # always uses and nonsensical for subpixel float kps.
            kps0 = jnp.floor(batch["kps0"])
            kps1 = jnp.floor(batch["kps1"])
            r0 = pixels_to_rays(camera, kps0[:, 0], kps0[:, 1], image_idx=i0)
            r1 = pixels_to_rays(camera, kps1[:, 0], kps1[:, 1], image_idx=i1)
            use_undistort = (
                train_cfg.prd_undistort and camera.config.use_distortion
            )
            if use_undistort:
                from scnerf_tpu.camera.model import get_distortion

                dist_k = get_distortion(camera)
                image_wh = (camera.config.W, camera.config.H)
            else:
                dist_k, image_wh = None, None
            prd, n_match = prd_loss(
                batch["kps0"] + 0.5, batch["kps1"] + 0.5, r0, r1,
                get_intrinsic(camera), get_extrinsic(camera, jnp.stack([i0, i1])),
                mask=batch.get("kp_mask"),
                threshold=train_cfg.prd_threshold,
                method="NeRF++",
                mode="train",
                distortion_k=dist_k,
                image_wh=image_wh,
            )
            w = prd_active(step, curriculum)
            safe = jnp.where(n_match > 0, prd, 0.0)
            loss = loss + w * safe
            metrics["prd"] = safe
            metrics["prd_matches"] = n_match
        metrics["loss"] = loss
        return loss, metrics

    def step_fn(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key, state.step
        )
        grads = mask_tree_camera_grads(grads, state.step, curriculum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
