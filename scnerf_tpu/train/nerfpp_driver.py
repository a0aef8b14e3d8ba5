"""NeRF++ pipeline training driver.

Rebuild of ``ddp_train_nerf()`` (``/root/reference/nerfplusplus/
ddp_train_nerf.py:311-620``) as a library function. Single program; scale-out
happens by sharding the ray batch over the mesh (``distributed/mesh.py``)
rather than process spawning.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera.model import CameraConfig, OPENCV, init_camera
from scnerf_tpu.core.config import ExperimentConfig
from scnerf_tpu.data.batching import sample_pixels
from scnerf_tpu.data.nerfpp_split import (
    check_cameras_in_unit_sphere,
    load_nerfpp_split,
)
from scnerf_tpu.fields.nerfpp import NerfPPConfig, init_nerfpp_net
from scnerf_tpu.matching.pairs import flatten_pairs, image_pair_candidates
from scnerf_tpu.matching.provider import (
    PrecomputedMatches,
    SIFTMatcher,
    build_match_cache,
    matcher_from_config,
    pad_matches,
    sift_available,
)
from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig
from scnerf_tpu.train.checkpoint import save_checkpoint
from scnerf_tpu.train.curriculum import Curriculum, prd_cadence_at
from scnerf_tpu.train.logging_utils import MetricLogger
from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
from scnerf_tpu.train.optim import make_optimizer
from scnerf_tpu.train.step import TrainState, create_train_state


@dataclass
class NerfPPExperiment:
    cfg: ExperimentConfig
    state: TrainState
    step_fn: Any
    step_prd_fn: Any | None
    model_cfg: NerfPPConfig
    render_cfg: NerfPPRenderConfig
    curriculum: Curriculum
    train_data: Any
    match_cache: PrecomputedMatches | None
    pair_list: np.ndarray | None
    eval_data: Any = None  # lazily-loaded held-out split ("" = tried, absent)
    device_step: Any = None  # (state, key) step with on-device sampling
    rng: np.random.RandomState = field(default_factory=lambda: np.random.RandomState(777))
    logger: MetricLogger | None = None


def build_nerfpp_experiment(cfg: ExperimentConfig, expdir: str | None = None) -> NerfPPExperiment:
    if cfg.camera.prd_on_fisheye and not (
            cfg.camera.prd_undistort and cfg.camera.use_distortion):
        # Distortion-blind PRD against keypoints in distorted fisheye pixel
        # space yields systematically biased camera gradients — the failure
        # mode the reference avoids by skipping PRD on fisheye entirely
        # (ddp_train_nerf.py:497). The only supported fisheye-PRD
        # combination is the distortion-aware one.
        raise ValueError(
            "camera.prd_on_fisheye requires camera.prd_undistort and "
            "camera.use_distortion (distortion-aware PRD); a distortion-"
            "blind PRD on fisheye keypoints biases the camera gradients.")
    rng = np.random.RandomState(cfg.logging.seed)
    train = load_nerfpp_split(
        cfg.dataset.datadir, "train",
        normalize_factor=cfg.dataset.normalize_factor,
    )
    check_cameras_in_unit_sphere(train.poses)

    model_cfg = NerfPPConfig(
        depth=cfg.model.netdepth, width=cfg.model.netwidth,
        max_freq_log2=cfg.model.multires,
        max_freq_log2_viewdirs=cfg.model.multires_views,
        compute_dtype=cfg.model.compute_dtype,
    )
    render_cfg = NerfPPRenderConfig(
        cascade_samples=tuple(cfg.model.cascade_samples),
        chunk=cfg.sampling.chunk,
    )
    train_cfg = NerfPPTrainConfig(
        lr_init=cfg.optim.lrate,
        lr_decay_steps=float(cfg.optim.lrate_decay_steps),
        lr_decay_factor=cfg.optim.lrate_decay_factor,
        autoexpo=cfg.model.autoexpo,
        lambda_autoexpo=cfg.model.lambda_autoexpo,
        prd_threshold=cfg.camera.proj_ray_dist_threshold,
        prd_undistort=cfg.camera.prd_undistort,
    )
    curriculum = Curriculum(
        add_ie=cfg.camera.add_ie, add_od=cfg.camera.add_od,
        add_radial=cfg.camera.add_radial, add_prd=cfg.camera.add_prd,
        i_ray_dist_loss=cfg.camera.i_ray_dist_loss,
        ray_dist_loss_weight=cfg.camera.ray_dist_loss_weight,
        prd_anneal_until=cfg.camera.prd_anneal_until,
        ray_dist_loss_weight_after=cfg.camera.ray_dist_loss_weight_after,
        i_ray_dist_loss_after=cfg.camera.i_ray_dist_loss_after,
    )

    key = jax.random.key(cfg.logging.seed)
    n_imgs = train.poses.shape[0]
    params = {
        "levels": [
            init_nerfpp_net(jax.random.fold_in(key, m), model_cfg,
                            n_images=n_imgs, autoexpo=cfg.model.autoexpo)
            for m in range(cfg.model.cascade_level)
        ],
    }
    if cfg.camera.use_camera:
        from scnerf_tpu.core.config import resolved_noise_scales

        cam_cfg = CameraConfig(
            H=train.H, W=train.W, grid_size=cfg.camera.grid_size,
            convention=OPENCV, pixel_offset=0.5,
            use_distortion=cfg.camera.use_distortion,
            # The reference's Distortion variant registers ray_o/ray_d noise
            # from one shared tensor (camera_model.py:224,258-262) — fisheye
            # runs train a single tied grid; see CameraConfig.tied_ray_noise.
            tied_ray_noise=cfg.camera.use_distortion,
            multiplicative_noise=cfg.camera.multiplicative_noise,
            intrinsics_noise_scale=cfg.camera.intrinsics_noise_scale,
            distortion_noise_scale=cfg.camera.distortion_noise_scale,
            **resolved_noise_scales(cfg.camera, "nerfpp"),
        )
        k = train.k[0] if (train.k is not None and cfg.camera.use_distortion) else None
        params["camera"] = init_camera(train.intrinsics[0], train.poses, cam_cfg, k=k)

    tx = make_optimizer(
        train_cfg.lr_init, train_cfg.lr_decay_steps,
        decay_factor=train_cfg.lr_decay_factor,
        weight_decay=cfg.optim.non_linear_weight_decay if cfg.optim.use_custom_optim else 0.0,
        params_example=params,
        # NeRF++ clamps the decayed rate at 1% of the initial one
        # (ddp_train_nerf.py:388-390); the NeRF schedule has no floor.
        lr_floor=0.01 * train_cfg.lr_init,
        camera_lr_mult=cfg.optim.camera_lrate_mult,
        camera_lr_mult_until=cfg.optim.camera_lrate_mult_until,
        camera_lr_mult_hold=cfg.optim.camera_lrate_mult_hold,
        distortion_lr_mult=cfg.optim.distortion_lrate_mult,
        distortion_lr_mult_until=cfg.optim.distortion_lrate_mult_until,
        distortion_lr_mult_hold=cfg.optim.distortion_lrate_mult_hold,
    )
    state = create_train_state(params, tx)

    # Camera-transfer modes (reference load_camera / load_test,
    # nerfplusplus/create_nerf.py:114-129): pull calibrated camera fields
    # from another experiment's checkpoint.
    transfer = getattr(cfg.optim, "load_camera_path", None)
    if transfer:
        from scnerf_tpu.train.checkpoint import restore_camera_partial, restore_checkpoint

        restored = restore_checkpoint(transfer, state)
        if restored is not None and "camera" in params:
            params["camera"] = restore_camera_partial(
                params["camera"], restored.params["camera"],
                skip_extrinsics=not getattr(cfg.optim, "load_test", False),
            )
            state = create_train_state(params, tx)

    prd_on = (
        cfg.camera.use_camera
        and cfg.camera.ray_loss_type == "proj_ray_dist"
        # The reference skips PRD for fisheye runs (its PRD is
        # distortion-blind, ddp_train_nerf.py:497); prd_on_fisheye
        # re-enables it for the distortion-aware variant.
        and (not cfg.camera.run_fisheye or cfg.camera.prd_on_fisheye)
    )
    step_fn = make_nerfpp_train_step(model_cfg, render_cfg, train_cfg, curriculum,
                                     tx, with_prd=False, donate=False)
    step_prd_fn = (
        make_nerfpp_train_step(model_cfg, render_cfg, train_cfg, curriculum,
                               tx, with_prd=True, donate=False)
        if prd_on else None
    )

    match_cache = None
    pair_list = None
    if prd_on:
        pairs = image_pair_candidates(train.poses, cfg.camera.pairing_angle_threshold)
        pair_list = flatten_pairs(pairs)
        if len(pair_list) == 0:
            # use_prd gates on this list: with zero candidates the PRD step
            # silently never dispatches even though prd_on is True (the
            # reference would likewise find no feasible pair,
            # reprojection.py image_pair_candidates — but loudly knowing it
            # beats a vacuous run; this cost two TPU soak legs in r5).
            print("[nerfpp] WARNING: PRD enabled but image_pair_candidates "
                  f"found 0 pairs at pairing_angle_threshold="
                  f"{cfg.camera.pairing_angle_threshold} deg — the PRD loss "
                  "will never fire", flush=True)
        cache_path = os.path.join(expdir, "matches.npz") if expdir else None
        if cache_path and os.path.exists(cache_path):
            match_cache = PrecomputedMatches(cache_path)
        elif train.images is not None:
            m = matcher_from_config(cfg.camera)  # sift / superglue / None
            match_cache = (
                build_match_cache(train.images, pair_list, m, cache_path)
                if m is not None else PrecomputedMatches(cache_path)
            )
        else:
            match_cache = PrecomputedMatches(cache_path)

    device_step = None
    if cfg.sampling.device_sampling and train.images is not None:
        from scnerf_tpu.train.device_sampling import make_nerfpp_device_sampling_step

        fixed = {} if cfg.camera.use_camera else dict(
            intrinsics=train.intrinsics, poses=train.poses
        )
        device_step = make_nerfpp_device_sampling_step(
            step_fn, train.images, cfg.sampling.N_rand,
            masks=train.masks, min_depths=train.min_depths, **fixed,
        )

    logger = MetricLogger(expdir, use_wandb=cfg.logging.use_wandb) if expdir else None
    if logger:
        logger.snapshot_config(cfg.to_json())
    return NerfPPExperiment(
        cfg=cfg, state=state, step_fn=step_fn, step_prd_fn=step_prd_fn,
        model_cfg=model_cfg, render_cfg=render_cfg, curriculum=curriculum,
        train_data=train, match_cache=match_cache, pair_list=pair_list,
        rng=rng, logger=logger, device_step=device_step,
    )


def nerfpp_sample_batch(exp: NerfPPExperiment) -> dict:
    cfg = exp.cfg
    train = exp.train_data
    n_rand = cfg.sampling.N_rand
    img_i = exp.rng.randint(0, train.poses.shape[0])
    px, py = sample_pixels(exp.rng, train.H, train.W, n_rand)
    pxi, pyi = px.astype(np.int64), py.astype(np.int64)
    target = train.images[img_i, pyi, pxi]
    batch = {
        "px": jnp.asarray(px),
        "py": jnp.asarray(py),
        "img_idx": jnp.asarray(img_i),
        "target": jnp.asarray(target, jnp.float32),
        "min_depth": jnp.full((n_rand,), 1e-4),
    }
    if not cfg.camera.use_camera:
        # No learnable camera: rays come from the dataset K/pose (the
        # reference's get_rays_single_image path).
        from scnerf_tpu.camera.rays import rays_opencv

        batch["rays_o"], batch["rays_d"] = rays_opencv(
            jnp.asarray(train.intrinsics[img_i]), jnp.asarray(train.poses[img_i]),
            batch["px"], batch["py"],
        )
    if train.masks is not None and cfg.model.mask_train_loss:
        # Opt-in divergence: the reference trains UNMASKED — masks ride in
        # its ray batch but img2mse never receives them
        # (ddp_train_nerf.py:485-489 vs utils.py:12-16); they only weight
        # eval metrics (ddp_test_nerf.py calculate_metrics). We keep the
        # same default and expose masked training as a flag.
        batch["mask"] = jnp.asarray(train.masks[img_i, pyi, pxi], jnp.float32)
    if train.min_depths is not None:
        batch["min_depth"] = jnp.asarray(train.min_depths[img_i, pyi, pxi], jnp.float32)
    return batch


def run_nerfpp_training(cfg: ExperimentConfig, expdir: str,
                        n_steps: int | None = None,
                        exp: NerfPPExperiment | None = None):
    """Production host loop. ``exp`` lets a caller pass a prebuilt
    experiment (and keep it for continuation — its ``state`` field tracks
    the loop); built from ``cfg`` when omitted."""
    if exp is None:
        exp = build_nerfpp_experiment(cfg, expdir)
    n_steps = n_steps if n_steps is not None else cfg.optim.N_iters
    key = jax.random.key(cfg.logging.seed + 1)
    ckpt_dir = os.path.join(expdir, "ckpts")
    metrics = {}
    for it in range(int(exp.state.step), n_steps):
        use_prd = (
            exp.step_prd_fn is not None
            and it >= exp.curriculum.add_prd
            and it % prd_cadence_at(it, exp.curriculum) == 0
            and exp.pair_list is not None and len(exp.pair_list) > 0
        )
        if not use_prd and exp.device_step is not None:
            exp.state, metrics = exp.device_step(
                exp.state, jax.random.fold_in(key, it)
            )
            batch = None
        elif use_prd:
            batch = nerfpp_sample_batch(exp)
            i, j = exp.pair_list[exp.rng.randint(0, len(exp.pair_list))]
            m = exp.match_cache.get(int(i), int(j)) if exp.match_cache else None
            if m is not None and m.kps0.shape[0] > 0:
                kps0, kps1, mask = pad_matches(m, cfg.camera.match_num)
                batch.update(
                    kps0=jnp.asarray(kps0), kps1=jnp.asarray(kps1),
                    kp_mask=jnp.asarray(mask), pair_idx=jnp.asarray([int(i), int(j)]),
                )
                exp.state, metrics = exp.step_prd_fn(exp.state, batch, jax.random.fold_in(key, it))
            else:
                exp.state, metrics = exp.step_fn(exp.state, batch, jax.random.fold_in(key, it))
        else:
            batch = nerfpp_sample_batch(exp)
            exp.state, metrics = exp.step_fn(exp.state, batch, jax.random.fold_in(key, it))
        # Host-side step counter: state.step is exactly it+1 (one increment
        # per call). Reading int(state.step) here would block on the device
        # EVERY iteration — over the axon tunnel that round-trip (~0.1 s)
        # capped the whole driver loop at ~7 steps/s while the compiled
        # step itself runs at ~28/s (r3c soak diagnosis).
        step_now = it + 1
        if exp.logger and step_now % cfg.logging.i_print == 0:
            exp.logger.log(step_now, metrics)
        if exp.logger and step_now % cfg.logging.i_testset == 0:
            # Held-out render metrics + PRD, the ddp_test_nerf protocol
            # (ddp_test_nerf.py:121-123,32-116) run periodically in-loop.
            res = evaluate_nerfpp(exp, max_views=2)
            res.update(evaluate_nerfpp_prd(exp))
            exp.logger.log(step_now, {f"test/{k}": v for k, v in res.items()})
        if exp.logger and step_now % cfg.logging.i_img == 0:
            # One in-training render panel (the reference's i_img hook:
            # render_single_image + log_view_to_tb, ddp_train_nerf.py:580-601,
            # 259-294): rgb / fg / bg / colorized fg depth.
            from scnerf_tpu.core.imaging import colorize_depth

            data = _held_out_data(exp) or exp.train_data
            if data is exp.train_data:
                out = render_nerfpp_image(exp, img_idx=0)
            else:
                out = render_nerfpp_image(exp, c2w=data.poses[0],
                                          K=data.intrinsics[0],
                                          hw=(data.H, data.W))
            exp.logger.log_images(step_now, {
                "val/rgb": np.clip(out["rgb"], 0, 1),
                "val/fg_rgb": np.clip(out["fg_rgb"], 0, 1),
                "val/bg_rgb": np.clip(out["bg_rgb"], 0, 1),
                "val/fg_depth": colorize_depth(out["fg_depth"]),  # [0,1] rgb
            })
        if step_now % cfg.logging.i_weights == 0:
            from scnerf_tpu.train.checkpoint import optim_knobs

            save_checkpoint(ckpt_dir, exp.state, optim_meta=optim_knobs(cfg))
        if exp.logger and step_now % cfg.logging.camera_log == 0 and \
                exp.state.params.get("camera") is not None:
            from scnerf_tpu.camera.model import camera_log_dict, camera_log_images

            exp.logger.log(
                step_now,
                camera_log_dict(exp.state.params["camera"],
                                gt_K=exp.train_data.intrinsics[0]),
            )
            exp.logger.log_images(
                step_now, camera_log_images(exp.state.params["camera"])
            )
    return exp.state, metrics


def render_nerfpp_image(exp: NerfPPExperiment, img_idx: int | None = None,
                        c2w=None, K=None, key=None, resolution_level: int = 1,
                        hw: tuple | None = None):
    """Full-image NeRF++ render (H, W) maps.

    With the camera model, rays come from the learned parameters at
    ``img_idx`` (the reference's ``get_all`` camera path,
    ``nerf_sample_ray_split.py:103-123``); otherwise from the given K/c2w.
    ``resolution_level`` renders at ``H//L x W//L`` with K scaled by 1/L
    (the reference's ``set_resolution_level``,
    ``nerf_sample_ray_split.py:64-70``). The camera-model path renders at
    full resolution only (its learned grids are tied to H, W).
    """
    from scnerf_tpu.camera.rays import pixels_to_rays, full_image_pixels
    from scnerf_tpu.geometry.so3 import K_inverse_3x3
    from scnerf_tpu.render.nerfpp_renderer import render_chunked_nerfpp

    train = exp.train_data
    key = key if key is not None else jax.random.key(0)
    camera = exp.state.params.get("camera")
    if camera is not None and img_idx is not None and resolution_level == 1:
        Hr, Wr = train.H, train.W
        px, py = full_image_pixels(Hr, Wr)
        rays_o, rays_d = pixels_to_rays(camera, px, py, image_idx=img_idx)
    elif camera is not None and c2w is not None and resolution_level == 1 \
            and (hw is None or tuple(hw) == (train.H, train.W)):
        # Held-out pose through the LEARNED camera: calibrated K (+noise),
        # distortion warp, ray-noise grids, given c2w — the reference's
        # camera_idx=None eval path (``nerf_sample_ray_split.py:114-124``:
        # render_ray_from_camera(..., extrinsic=sampler.c2w)).
        Hr, Wr = train.H, train.W
        px, py = full_image_pixels(Hr, Wr)
        rays_o, rays_d = pixels_to_rays(camera, px, py, c2w=jnp.asarray(c2w))
    else:
        L = resolution_level
        H0, W0 = hw if hw is not None else (train.H, train.W)
        Hr, Wr = H0 // L, W0 // L
        px, py = full_image_pixels(Hr, Wr)
        from scnerf_tpu.camera.rays import rays_opencv

        Kmat = np.array(K if K is not None else train.intrinsics[img_idx or 0])
        Kmat = Kmat.copy()
        Kmat[:2, :3] /= L
        c2w = jnp.asarray(c2w if c2w is not None else train.poses[img_idx or 0])
        rays_o, rays_d = rays_opencv(jnp.asarray(Kmat), c2w, px, py)
    out = render_chunked_nerfpp(
        exp.state.params["levels"], exp.model_cfg,
        exp.render_cfg.replace(perturb=False),
        rays_o, rays_d, jnp.full((rays_o.shape[0],), 1e-4), key,
    )
    return {k: np.asarray(v).reshape((Hr, Wr) + v.shape[1:])
            for k, v in out.items()}


def _held_out_data(exp: NerfPPExperiment):
    """Lazily load the validation (fallback: test) split; None if absent."""
    if exp.eval_data is None:
        exp.eval_data = ""
        for split in ("validation", "test"):
            try:
                exp.eval_data = load_nerfpp_split(
                    exp.cfg.dataset.datadir, split,
                    normalize_factor=exp.cfg.dataset.normalize_factor,
                )
                break
            except (FileNotFoundError, OSError, ValueError):
                continue
    return exp.eval_data or None


def evaluate_nerfpp(exp: NerfPPExperiment, max_views: int | None = 2,
                    data=None) -> dict:
    """PSNR/SSIM[/LPIPS] over held-out renders — the ``ddp_test_nerf``
    metric protocol (``ddp_test_nerf.py:121-123``). Held-out poses render
    through the LEARNED camera when one exists (calibrated K + noise
    grids, the reference's camera_idx=None eval path), else the dataset
    K; falls back to train views when the scene ships no validation/test
    split, reported as ``split: "train"``."""
    from scnerf_tpu.losses.photometric import img2mse, mse2psnr
    from scnerf_tpu.metrics.lpips import lpips, lpips_available, load_weights
    from scnerf_tpu.metrics.ssim import ssim

    data = data if data is not None else _held_out_data(exp)
    split = "heldout"
    if data is None or data is exp.train_data:
        data, split = exp.train_data, "train"
    n = data.poses.shape[0] if max_views is None else min(max_views, data.poses.shape[0])
    lpips_w = load_weights() if lpips_available() else None
    psnrs, ssims, lpipss = [], [], []
    for i in range(n):
        if data is exp.train_data:
            out = render_nerfpp_image(exp, img_idx=i)
        else:
            out = render_nerfpp_image(
                exp, c2w=data.poses[i], K=data.intrinsics[i],
                hw=(data.H, data.W),
            )
        target = data.images[i]
        mse = float(img2mse(jnp.asarray(out["rgb"]), jnp.asarray(target)))
        psnrs.append(float(mse2psnr(jnp.asarray(mse))))
        ssims.append(float(ssim(jnp.asarray(out["rgb"]), jnp.asarray(target))))
        if lpips_w is not None:
            lpipss.append(float(lpips(jnp.asarray(out["rgb"]),
                                      jnp.asarray(target), lpips_w)))
    res = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "n_views": n, "split": split}
    if lpipss:
        res["lpips"] = float(np.mean(lpipss))
    return res


def evaluate_nerfpp_prd(exp: NerfPPExperiment) -> dict:
    """NeRF++ PRD evaluation (``ddp_test_nerf.py:32-116``): feasible pairs
    over the cameras, correspondences per pair, train-mode (unclamped,
    no GT filter — NeRF++ scenes treat COLMAP poses as the camera under
    evaluation) PRD with ``method="NeRF++"``."""
    from scnerf_tpu.camera.model import get_extrinsics, get_intrinsic
    from scnerf_tpu.camera.rays import pixels_to_rays
    from scnerf_tpu.losses.prd_eval import prd_evaluation
    from scnerf_tpu.matching.pairs import flatten_pairs, image_pair_candidates
    from scnerf_tpu.matching.provider import SIFTMatcher, build_match_cache, sift_available
    from scnerf_tpu.geometry.so3 import K_inverse_3x3

    train = exp.train_data
    camera = exp.state.params.get("camera")
    if camera is not None:
        K = get_intrinsic(camera)
        E = np.asarray(get_extrinsics(camera))
    else:
        K = jnp.asarray(train.intrinsics[0])
        E = np.asarray(train.poses)
    if exp.pair_list is not None and len(exp.pair_list) and exp.match_cache is not None:
        pair_list, cache = exp.pair_list, exp.match_cache
    else:
        if not sift_available():
            return {}
        pairs = image_pair_candidates(E, exp.cfg.camera.pairing_angle_threshold)
        pair_list = flatten_pairs(pairs)
        if len(pair_list) == 0:
            return {}
        cache = build_match_cache(train.images, pair_list, SIFTMatcher())
        exp.pair_list, exp.match_cache = pair_list, cache

    # Reference eval rays are cast at the TRUNCATED keypoint pixel
    # (ddp_test_nerf.py:61-63: float kps -> .long() flat index; the +0.5
    # center comes from ray gen itself). Loss targets stay the raw float
    # kps — the reference's eval does NOT add the +0.5 its train loop adds.
    if camera is not None:
        def rays_eval(kps, idx):
            kps = jnp.floor(kps)
            return pixels_to_rays(camera, kps[:, 0], kps[:, 1], image_idx=idx)
    else:
        Kinv = K_inverse_3x3(jnp.asarray(K))

        def rays_eval(kps, idx):
            kps = jnp.floor(kps)
            pix = jnp.stack(
                [kps[:, 0] + 0.5, kps[:, 1] + 0.5, jnp.ones_like(kps[:, 0])], -1
            )
            dirs = jnp.matmul(pix, Kinv.T, precision="highest")
            c2w = jnp.asarray(E[int(idx)])
            d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
            o = jnp.broadcast_to(c2w[:3, 3], d.shape)
            return o, d

    val = prd_evaluation(
        pair_list, cache, rays_eval, K, E,
        mode="train", method="NeRF++",
        max_matches=exp.cfg.camera.match_num,
        threshold=exp.cfg.camera.proj_ray_dist_threshold,
    )
    return {"prd": val} if np.isfinite(val) else {}
