"""The compiled joint camera+NeRF training step.

Rebuild of the hot loop of ``/root/reference/NeRF/run_nerf.py:328-621``
(ray sampling -> render -> MSE [+ PRD] -> backward -> Adam -> LR decay) as a
single pure function: params-in, params-out, one ``jit``. Differences from
the reference, by design:

- The whole step (ray generation, both MLP sweeps, compositing, losses,
  optimizer) is one XLA program — no Python between ops, no host sync.
- Curriculum is gradient masking by step count (``train/curriculum.py``), so
  one compiled step serves the entire schedule.
- The PRD loss joins the same backward pass (the reference calls a separate
  ``backward`` on the summed loss; numerically identical, but here it also
  shares the compiled program). Steps without a PRD batch compile a second,
  cheaper variant.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from scnerf_tpu.camera.model import Camera, get_extrinsic, get_intrinsic
from scnerf_tpu.camera.rays import pixels_to_rays
from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.fields.nerf import NeRFConfig
from scnerf_tpu.geometry.ndc import ndc_rays
from scnerf_tpu.losses.photometric import img2mse, mse2psnr
from scnerf_tpu.losses.prd import prd_loss
from scnerf_tpu.render.renderer import RenderConfig, render_rays
from scnerf_tpu.train.curriculum import Curriculum, mask_tree_camera_grads, prd_active


@pytree_dataclass
class TrainState:
    step: jnp.ndarray = None
    params: Any = None  # {"coarse": mlp, "fine": mlp|None, "camera": Camera|None}
    opt_state: Any = None


@pytree_dataclass
class TrainConfig:
    lr_init: float = static_field(default=5e-4)
    lr_decay_steps: float = static_field(default=250_000)
    lr_decay_factor: float = static_field(default=0.1)
    weight_decay: float = static_field(default=0.0)
    use_ndc: bool = static_field(default=False)
    near: float = static_field(default=0.0)
    far: float = static_field(default=1.0)
    # PRD geometry method ("NeRF" negates fx; "NeRF++" does not).
    prd_method: str = static_field(default="NeRF")
    prd_threshold: float = static_field(default=5.0)


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_train_step(
    model_cfg: NeRFConfig,
    render_cfg: RenderConfig,
    train_cfg: TrainConfig,
    curriculum: Curriculum,
    tx: optax.GradientTransformation,
    with_prd: bool = False,
    donate: bool = True,
):
    """Build the jitted train step.

    The returned function has signature ``step(state, batch, key) ->
    (state, metrics)`` where ``batch`` contains either precomputed rays
    (``rays_o``, ``rays_d``) or pixel requests (``px``, ``py``, ``img_idx``)
    plus ``target`` RGB, and — when ``with_prd`` — a padded correspondence
    batch (``kps0``, ``kps1`` ``(M, 2)``, ``pair_idx`` ``(2,)``, ``kp_mask``).
    """

    def loss_fn(params, batch, key, step):
        camera: Camera | None = params.get("camera")
        if "rays_o" in batch:
            rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        else:
            rays_o, rays_d = pixels_to_rays(
                camera, batch["px"], batch["py"], image_idx=batch["img_idx"]
            )
        viewdirs = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
        if train_cfg.use_ndc:
            if camera is not None:
                K = get_intrinsic(camera)
                fx, fy = K[0, 0], K[1, 1]
            else:
                fx = fy = batch["focal"]
            H = camera.config.H if camera is not None else batch["H"]
            W = camera.config.W if camera is not None else batch["W"]
            rays_o, rays_d = ndc_rays(H, W, fx, fy, 1.0, rays_o, rays_d)

        out = render_rays(
            params,
            model_cfg,
            render_cfg,
            rays_o,
            rays_d,
            viewdirs if render_cfg.use_viewdirs else None,
            train_cfg.near,
            train_cfg.far,
            key,
            rands=batch.get("rands"),
        )
        target = batch["target"]
        # The reference clamps rgb >= 1 to 1 in-place before the loss
        # (render.py:404-406) — clamped pixels get zero gradient; minimum()
        # reproduces both the value and the gradient behavior.
        rgb = jnp.minimum(out["rgb"], 1.0)
        mse = img2mse(rgb, target)
        loss = mse
        metrics = {"mse": mse, "psnr": mse2psnr(mse)}
        if "rgb0" in out:
            mse0 = img2mse(jnp.minimum(out["rgb0"], 1.0), target)
            loss = loss + mse0
            metrics["mse0"] = mse0

        if with_prd:
            assert camera is not None, "PRD requires the camera model"
            i0 = batch["pair_idx"][0]
            i1 = batch["pair_idx"][1]
            r0 = pixels_to_rays(
                camera, batch["kps0"][:, 0], batch["kps0"][:, 1], image_idx=i0
            )
            r1 = pixels_to_rays(
                camera, batch["kps1"][:, 0], batch["kps1"][:, 1], image_idx=i1
            )
            K4 = get_intrinsic(camera)
            E_pair = get_extrinsic(camera, jnp.stack([i0, i1]))
            prd, n_match = prd_loss(
                batch["kps0"],
                batch["kps1"],
                r0,
                r1,
                K4,
                E_pair,
                mask=batch.get("kp_mask"),
                threshold=train_cfg.prd_threshold,
                method=train_cfg.prd_method,
                mode="train",
            )
            w = prd_active(step, curriculum)
            # NaN-skip semantics of the reference (run_nerf.py:592-599): a
            # pair with no valid matches contributes nothing.
            safe_prd = jnp.where(n_match > 0, prd, 0.0)
            loss = loss + w * safe_prd
            metrics["prd"] = safe_prd
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
