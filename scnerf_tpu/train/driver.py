"""NeRF-pipeline training driver.

Rebuild of ``train()`` (``/root/reference/NeRF/run_nerf.py:82-1043``) as a
library function: config tree in, trained state + metrics out. Orchestrates
dataset loading, camera construction, correspondence caching, the compiled
train steps (photometric and photometric+PRD variants), periodic logging,
checkpointing, and validation rendering with ATE-aligned poses.

The hot path stays entirely on device; the driver's Python loop only samples
pixel indices (numpy) and dispatches the jitted step.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera.model import (
    Camera,
    CameraConfig,
    OPENGL,
    get_extrinsics,
    get_intrinsic,
    init_camera,
)
from scnerf_tpu.camera.rays import pixels_to_rays, rays_no_camera
from scnerf_tpu.core.config import ExperimentConfig
from scnerf_tpu.data.batching import RayPool, gather_target, sample_pixels
from scnerf_tpu.data.noise import NoiseConfig
from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
from scnerf_tpu.geometry.alignment import align_c2w_trajectories, apply_sim3
from scnerf_tpu.losses.photometric import img2mse, mse2psnr
from scnerf_tpu.matching.pairs import flatten_pairs, image_pair_candidates
from scnerf_tpu.matching.provider import (
    PrecomputedMatches,
    SIFTMatcher,
    build_match_cache,
    matcher_from_config,
    pad_matches,
    sift_available,
)
from scnerf_tpu.metrics.ssim import ssim
from scnerf_tpu.render.renderer import RenderConfig, render_chunked
from scnerf_tpu.train.checkpoint import save_checkpoint
from scnerf_tpu.train.curriculum import Curriculum, prd_cadence_at
from scnerf_tpu.train.logging_utils import MetricLogger
from scnerf_tpu.train.optim import make_optimizer
from scnerf_tpu.train.step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
)


@dataclass
class NerfExperiment:
    """Everything the loop needs, assembled once."""

    cfg: ExperimentConfig
    state: TrainState
    step_fn: Any
    step_prd_fn: Any | None
    model_cfg: NeRFConfig
    render_cfg: RenderConfig
    train_cfg: TrainConfig
    curriculum: Curriculum
    images: np.ndarray  # (N, H, W, 3) float, white-composited if needed
    i_train: np.ndarray
    i_test: np.ndarray
    gt_intrinsic: np.ndarray
    gt_poses: np.ndarray
    noisy_poses: np.ndarray
    noisy_focal: float
    near: float
    far: float
    H: int = 0
    W: int = 0
    match_cache: PrecomputedMatches | None = None
    pair_list: np.ndarray | None = None
    # Lazy eval-split correspondence cache (built on first val/test PRD eval).
    eval_match_cache: PrecomputedMatches | None = None
    eval_pair_list: np.ndarray | None = None
    render_poses: np.ndarray | None = None  # (R, 4, 4) spiral/spherical path
    ray_pool: RayPool | None = None
    pixel_pool: Any | None = None  # use_batching + camera (PixelPool)
    device_step: Any | None = None  # (state, key) step with on-device sampling
    rng: np.random.RandomState = field(default_factory=lambda: np.random.RandomState(777))
    logger: MetricLogger | None = None


def _load_dataset(cfg: ExperimentConfig, rng):
    ds = cfg.dataset
    noise = NoiseConfig(
        intrinsic_scale=ds.initial_noise_size_intrinsic,
        rotation_deg=ds.initial_noise_size_rotation,
        translation=ds.initial_noise_size_translation,
        run_without_colmap=ds.run_without_colmap,
    )
    if ds.dataset_type == "llff":
        from scnerf_tpu.data.llff import load_llff

        d = load_llff(
            ds.datadir, factor=ds.factor, spherify=ds.spherify,
            llffhold=ds.llffhold, noise=noise, rng=rng,
        )
        images = d.images
        i_train, i_test = d.i_train, d.i_test
        if ds.no_ndc:
            near, far = float(d.bds.min() * 0.9), float(d.bds.max() * 1.0)
        else:
            near, far = 0.0, 1.0
        rp = np.broadcast_to(np.eye(4), (len(d.render_poses), 4, 4)).copy()
        rp[:, :3, :4] = d.render_poses[:, :3, :4]
        return (images, d.noisy_poses, d.gt_poses, d.gt_intrinsic, d.noisy_focal,
                i_train, i_test, near, far, d.H, d.W, rp.astype(np.float32))
    elif ds.dataset_type == "blender":
        from scnerf_tpu.data.blender import load_blender

        d = load_blender(ds.datadir, half_res=ds.half_res, testskip=ds.testskip,
                         noise=noise, rng=rng)
        if ds.white_bkgd:
            images = d.images[..., :3] * d.images[..., 3:] + (1.0 - d.images[..., 3:])
        else:
            images = d.images[..., :3]
        i_train, i_val, i_test = d.i_split
        from scnerf_tpu.data.blender import pose_spherical

        rp = np.stack(
            [np.array(pose_spherical(a, -30.0, 4.0))
             for a in np.linspace(-180, 180, 41)[:-1]]
        ).astype(np.float32)
        return (images.astype(np.float32), d.noisy_poses, d.gt_poses, d.gt_intrinsic,
                d.noisy_focal, i_train, i_test, 2.0, 6.0, d.H, d.W, rp)
    raise ValueError(f"unknown dataset_type {ds.dataset_type} for NeRF pipeline")


def build_experiment(cfg: ExperimentConfig, expdir: str | None = None) -> NerfExperiment:
    rng = np.random.RandomState(cfg.logging.seed)
    (images, noisy_poses, gt_poses, gt_K, noisy_focal,
     i_train, i_test, near, far, H, W, render_poses) = _load_dataset(cfg, rng)

    use_ndc = cfg.dataset.dataset_type == "llff" and not cfg.dataset.no_ndc
    model_cfg = NeRFConfig(
        depth=cfg.model.netdepth, width=cfg.model.netwidth,
        multires=cfg.model.multires, multires_views=cfg.model.multires_views,
        use_viewdirs=cfg.model.use_viewdirs, compute_dtype=cfg.model.compute_dtype,
    )
    render_cfg = RenderConfig(
        n_samples=cfg.sampling.N_samples, n_importance=cfg.sampling.N_importance,
        perturb=cfg.sampling.perturb, lindisp=cfg.dataset.lindisp,
        raw_noise_std=cfg.sampling.raw_noise_std, white_bkgd=cfg.dataset.white_bkgd,
        use_viewdirs=cfg.model.use_viewdirs, chunk=cfg.sampling.chunk,
    )
    train_cfg = TrainConfig(
        lr_init=cfg.optim.lrate,
        lr_decay_steps=cfg.optim.lrate_decay * 1000.0,
        use_ndc=use_ndc, near=near, far=far,
        prd_method="NeRF", prd_threshold=cfg.camera.proj_ray_dist_threshold,
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
    params = {
        "coarse": init_nerf_mlp(key, model_cfg),
        "fine": init_nerf_mlp(jax.random.fold_in(key, 1), model_cfg)
        if cfg.sampling.N_importance > 0 else None,
    }

    camera = None
    if cfg.camera.use_camera:
        # Camera is built over the TRAIN split only (i_map semantics of the
        # reference, run_nerf.py:179-183): camera index c corresponds to
        # image i_train[c].
        if cfg.dataset.run_without_colmap != "none":
            # fx=W, fy=H, cx=W/2, cy=H/2 init (create_nerf.py:95-123).
            K_init = np.array(
                [[W, 0, W / 2, 0], [0, H, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                np.float32,
            )
        else:
            K_init = gt_K.copy()
            K_init[0, 0] = K_init[1, 1] = noisy_focal
        from scnerf_tpu.core.config import resolved_noise_scales

        cam_cfg = CameraConfig(
            H=H, W=W, grid_size=cfg.camera.grid_size, convention=OPENGL,
            use_distortion=cfg.camera.use_distortion,
            multiplicative_noise=cfg.camera.multiplicative_noise,
            intrinsics_noise_scale=cfg.camera.intrinsics_noise_scale,
            distortion_noise_scale=cfg.camera.distortion_noise_scale,
            **resolved_noise_scales(cfg.camera, "nerf"),
        )
        camera = init_camera(K_init, noisy_poses[i_train], cam_cfg)
        params["camera"] = camera

    tx = make_optimizer(
        train_cfg.lr_init, train_cfg.lr_decay_steps,
        weight_decay=cfg.optim.non_linear_weight_decay if cfg.optim.use_custom_optim else 0.0,
        params_example=params,
        camera_lr_mult=cfg.optim.camera_lrate_mult,
        camera_lr_mult_until=cfg.optim.camera_lrate_mult_until,
        camera_lr_mult_hold=cfg.optim.camera_lrate_mult_hold,
        distortion_lr_mult=cfg.optim.distortion_lrate_mult,
        distortion_lr_mult_until=cfg.optim.distortion_lrate_mult_until,
        distortion_lr_mult_hold=cfg.optim.distortion_lrate_mult_hold,
    )
    state = create_train_state(params, tx)

    # Warm start / auto-resume (reference ft_path + latest-ckpt auto-resume,
    # NeRF/create_nerf.py:142-173; disabled by no_reload).
    if not cfg.optim.no_reload:
        from scnerf_tpu.train.checkpoint import restore_checkpoint

        if cfg.optim.ckpt_path.endswith(".tar") and os.path.exists(cfg.optim.ckpt_path):
            # MIGRATION path: ft_path pointing at a REFERENCE torch
            # checkpoint — convert weights in place (fresh optimizer state,
            # as the reference's own partial optimizer restore effectively
            # does for new params).
            from scnerf_tpu.tools.convert import load_reference_checkpoint

            ref = load_reference_checkpoint(cfg.optim.ckpt_path, depth=cfg.model.netdepth)
            params["coarse"] = ref["coarse"]
            if ref["fine"] is not None and "fine" in params:
                params["fine"] = ref["fine"]
            if ref["camera_fields"] and params.get("camera") is not None:
                params["camera"] = params["camera"].replace(**ref["camera_fields"])
            state = create_train_state(params, tx)
            state = state.replace(step=jnp.asarray(ref["step"], jnp.int32))
            print(f"[resume] converted reference checkpoint {cfg.optim.ckpt_path} "
                  f"at step {ref['step']}")
        else:
            from scnerf_tpu.train.checkpoint import optim_knobs

            for source in ([cfg.optim.ckpt_path] if cfg.optim.ckpt_path else []) + (
                [os.path.join(expdir, "ckpts")] if expdir else []
            ):
                restored = restore_checkpoint(source, state,
                                              optim_meta=optim_knobs(cfg))
                if restored is not None:
                    state = restored
                    print(f"[resume] restored step {int(state.step)} from {source}")
                    break

    prd_on = cfg.camera.use_camera and cfg.camera.ray_loss_type == "proj_ray_dist"
    step_fn = make_train_step(model_cfg, render_cfg, train_cfg, curriculum, tx,
                              with_prd=False, donate=False)
    step_prd_fn = (
        make_train_step(model_cfg, render_cfg, train_cfg, curriculum, tx,
                        with_prd=True, donate=False)
        if prd_on else None
    )

    match_cache = None
    pair_list = None
    if prd_on:
        pairs = image_pair_candidates(
            noisy_poses[i_train], cfg.camera.pairing_angle_threshold
        )
        pair_list = flatten_pairs(pairs)  # indices into the camera table
        cache_path = os.path.join(expdir, "matches.npz") if expdir else None
        if cache_path and os.path.exists(cache_path):
            match_cache = PrecomputedMatches(cache_path)
        elif len(pair_list):
            m = matcher_from_config(cfg.camera)  # sift / superglue / None
            match_cache = (
                build_match_cache(images[i_train], pair_list, m, cache_path)
                if m is not None else PrecomputedMatches(cache_path)
            )
        else:
            match_cache = PrecomputedMatches(cache_path)

    ray_pool, pixel_pool = None, None
    if cfg.sampling.use_batching and cfg.camera.use_camera:
        from scnerf_tpu.data.batching import PixelPool

        pixel_pool = PixelPool(len(i_train), H, W, rng=rng)
    if cfg.sampling.use_batching and not cfg.camera.use_camera:
        ros, rds, tgts = [], [], []
        for i in i_train:
            o, dvec = rays_no_camera(H, W, noisy_focal, jnp.asarray(noisy_poses[i]))
            ros.append(np.asarray(o))
            rds.append(np.asarray(dvec))
            tgts.append(images[i].reshape(-1, 3))
        ray_pool = RayPool(
            np.concatenate(ros), np.concatenate(rds), np.concatenate(tgts),
            seed=cfg.logging.seed,
        )

    device_step = None
    if (
        cfg.sampling.device_sampling
        and cfg.camera.use_camera
        and not cfg.sampling.use_batching
        and cfg.sampling.precrop_iters == 0
    ):
        from scnerf_tpu.train.device_sampling import make_device_sampling_step

        # NOTE: with per-ray image sampling the camera table covers the train
        # split only, so pass the train images in camera-table order.
        device_step = make_device_sampling_step(
            step_fn, images[i_train], n_rand=cfg.sampling.N_rand
        )

    logger = MetricLogger(expdir, use_wandb=cfg.logging.use_wandb) if expdir else None
    if logger:
        logger.snapshot_config(cfg.to_json())

    return NerfExperiment(
        cfg=cfg, state=state, step_fn=step_fn, step_prd_fn=step_prd_fn,
        model_cfg=model_cfg, render_cfg=render_cfg, train_cfg=train_cfg,
        curriculum=curriculum, images=images, i_train=i_train, i_test=i_test,
        gt_intrinsic=gt_K, gt_poses=gt_poses, noisy_poses=noisy_poses,
        noisy_focal=noisy_focal, near=near, far=far, H=H, W=W,
        match_cache=match_cache, pair_list=pair_list, ray_pool=ray_pool,
        pixel_pool=pixel_pool,
        device_step=device_step, rng=rng, logger=logger,
        render_poses=render_poses,
    )


def sample_batch(exp: NerfExperiment, step: int) -> dict:
    cfg = exp.cfg
    n_rand = cfg.sampling.N_rand
    if exp.ray_pool is not None:
        b = exp.ray_pool.next_batch(n_rand)
        return {k: jnp.asarray(v) for k, v in b.items()}
    if exp.pixel_pool is not None:
        # use_batching WITH camera (run_nerf.py:369-407): per-ray image
        # indices through the differentiable camera. The published
        # main-table regime (no_batching unset + camera model).
        ci, px, py = exp.pixel_pool.next_batch(n_rand)
        target = gather_target(exp.images, exp.i_train[ci], px, py)
        return {
            "px": jnp.asarray(px),
            "py": jnp.asarray(py),
            "img_idx": jnp.asarray(ci),
            "target": jnp.asarray(target, jnp.float32),
        }
    precrop = (
        cfg.sampling.precrop_frac
        if step < cfg.sampling.precrop_iters
        else None
    )
    ci = exp.rng.randint(0, len(exp.i_train))  # camera-table index
    img_i = exp.i_train[ci]
    px, py = sample_pixels(exp.rng, exp.H, exp.W, n_rand, precrop)
    target = gather_target(exp.images, img_i, px, py)
    batch = {
        "px": jnp.asarray(px),
        "py": jnp.asarray(py),
        "img_idx": jnp.full((n_rand,), ci, jnp.int32),
        "target": jnp.asarray(target, jnp.float32),
    }
    if exp.state.params.get("camera") is None:
        o, d = rays_no_camera(
            exp.H, exp.W, exp.noisy_focal, jnp.asarray(exp.noisy_poses[img_i]),
            jnp.asarray(px), jnp.asarray(py),
        )
        batch = {"rays_o": o, "rays_d": d, "target": batch["target"],
                 "focal": exp.noisy_focal, "H": exp.H, "W": exp.W}
    return batch


def sample_prd_batch(exp: NerfExperiment) -> dict | None:
    """One random feasible pair with cached matches, padded."""
    if exp.pair_list is None or len(exp.pair_list) == 0 or exp.match_cache is None:
        return None
    for _ in range(8):
        i, j = exp.pair_list[exp.rng.randint(0, len(exp.pair_list))]
        m = exp.match_cache.get(int(i), int(j))
        if m is not None and m.kps0.shape[0] > 0:
            kps0, kps1, mask = pad_matches(m, exp.cfg.camera.match_num)
            return {
                "kps0": jnp.asarray(kps0),
                "kps1": jnp.asarray(kps1),
                "kp_mask": jnp.asarray(mask),
                "pair_idx": jnp.asarray([int(i), int(j)]),
            }
    return None


def train_loop(
    exp: NerfExperiment,
    n_steps: int | None = None,
    ckpt_dir: str | None = None,
    eval_hooks: bool = False,
):
    """Run the optimization loop; returns final state and last metrics.

    With ``eval_hooks`` the reference's periodic side tasks run too:
    ``i_testset`` test-split metrics (+PRD eval when a match cache exists),
    ``i_img`` one validation render, ``camera_log`` camera diagnostics
    (``run_nerf.py:643-900``).
    """
    from scnerf_tpu.train.profiling import StepTimer

    cfg = exp.cfg
    n_steps = n_steps if n_steps is not None else cfg.optim.N_iters
    key = jax.random.key(cfg.logging.seed + 1)
    metrics = {}
    timer = StepTimer()
    start = int(exp.state.step)
    for it in range(start, n_steps):
        use_prd = (
            exp.step_prd_fn is not None
            and it >= exp.curriculum.add_prd
            and it % prd_cadence_at(it, exp.curriculum) == 0
        )
        batch = (
            None
            if (not use_prd and exp.device_step is not None)
            else sample_batch(exp, it)
        )
        with timer:
            if batch is None:
                exp.state, metrics = exp.device_step(
                    exp.state, jax.random.fold_in(key, it)
                )
            elif use_prd:
                prd_batch = sample_prd_batch(exp)
                if prd_batch is not None and "px" in batch:
                    batch = dict(batch, **prd_batch)
                    exp.state, metrics = exp.step_prd_fn(
                        exp.state, batch, jax.random.fold_in(key, it)
                    )
                else:
                    exp.state, metrics = exp.step_fn(
                        exp.state, batch, jax.random.fold_in(key, it)
                    )
            else:
                exp.state, metrics = exp.step_fn(
                    exp.state, batch, jax.random.fold_in(key, it)
                )

        # it+1 == int(state.step) without the per-step device round-trip
        # (the blocking read capped the loop at the tunnel RTT — see the
        # NeRF++ driver's matching comment).
        step_now = it + 1
        if exp.logger and step_now % cfg.logging.i_print == 0:
            row = dict(metrics)
            row.update(timer.summary())
            exp.logger.log(step_now, row)
        if ckpt_dir and step_now % cfg.logging.i_weights == 0:
            from scnerf_tpu.train.checkpoint import optim_knobs

            save_checkpoint(ckpt_dir, exp.state, optim_meta=optim_knobs(cfg))
        if eval_hooks and exp.logger:
            if step_now % cfg.logging.i_testset == 0:
                res = evaluate_test_views(exp, max_views=2)
                res.update(evaluate_prd(exp))
                # GT-filtered val-protocol PRD (run_nerf.py:675-714 runs the
                # full projected_ray_distance_evaluation at every i_testset).
                res.update(evaluate_prd_split(exp, mode="val"))
                exp.logger.log(step_now, {f"test/{k}": v for k, v in res.items()})
            if step_now % cfg.logging.i_img == 0 and exp.logger is not None and len(exp.i_test):
                # One validation render (the reference's i_img hook,
                # run_nerf.py:819-894): PSNR logged, PNG dumped.
                idx = int(exp.i_test[0])
                c2w = (
                    aligned_eval_extrinsic(exp, idx)
                    if exp.state.params.get("camera") is not None
                    else exp.gt_poses[idx]
                )
                out = render_image(exp, c2w)
                mse = float(img2mse(jnp.asarray(out["rgb"]), jnp.asarray(exp.images[idx])))
                exp.logger.log(step_now, {"val/psnr": float(mse2psnr(jnp.asarray(mse)))})
                try:
                    import imageio.v2 as imageio
                    from scnerf_tpu.core.imaging import to8b

                    imageio.imwrite(
                        os.path.join(exp.logger.expdir, f"val_{step_now:08d}.png"),
                        to8b(out["rgb"]),
                    )
                except (ImportError, OSError) as e:
                    # PNG dump is best-effort (imageio/disk may be absent);
                    # anything else (bad shapes, NaN to8b) must surface.
                    print(f"[i_img] PNG dump skipped: {e}", flush=True)
            if (
                cfg.logging.i_video > 0
                and step_now % cfg.logging.i_video == 0
                and exp.render_poses is not None
            ):
                render_training_video(exp, step_now)
            if step_now % cfg.logging.camera_log == 0 and exp.state.params.get("camera") is not None:
                from scnerf_tpu.camera.model import camera_log_dict, camera_log_images

                exp.logger.log(
                    step_now,
                    camera_log_dict(
                        exp.state.params["camera"], gt_K=exp.gt_intrinsic
                    ),
                )
                exp.logger.log_images(
                    step_now, camera_log_images(exp.state.params["camera"])
                )
    return exp.state, metrics


def render_training_video(exp: NerfExperiment, step: int,
                          out_dir: str | None = None,
                          max_frames: int | None = None) -> str | None:
    """The ``i_video`` training hook (``run_nerf.py:252-283``): render the
    dataset's spiral/spherical path with the CURRENT model + camera and
    write ``video_{step}.mp4`` plus a normalised-disparity companion."""
    if exp.render_poses is None:
        return None
    out_dir = out_dir or (exp.logger.expdir if exp.logger else None)
    if out_dir is None:
        return None
    from scnerf_tpu.tools.video import array_to_video

    frames, disps = [], []
    for c2w in exp.render_poses[:max_frames]:
        out = render_image(exp, np.asarray(c2w))
        frames.append(out["rgb"])
        if "disp" in out:
            disps.append(out["disp"])
    path = os.path.join(out_dir, f"video_{step:08d}.mp4")
    array_to_video(np.stack(frames), path)
    if disps:
        d = np.stack(disps)
        array_to_video(
            (d / max(float(np.max(d)), 1e-10))[..., None].repeat(3, -1),
            os.path.join(out_dir, f"video_{step:08d}_disp.mp4"),
        )
    return path


def evaluate_prd(exp: NerfExperiment) -> dict:
    """Train-mode PRD over the train-split feasible pairs (the calibration
    signal logged during training, no GT involved)."""
    if exp.match_cache is None or exp.pair_list is None or len(exp.pair_list) == 0:
        return {}
    from scnerf_tpu.camera.model import get_extrinsics, get_intrinsic
    from scnerf_tpu.losses.prd_eval import prd_evaluation

    camera = exp.state.params.get("camera")
    if camera is None:
        return {}

    def rays_eval(kps, idx):
        return pixels_to_rays(camera, kps[:, 0], kps[:, 1], image_idx=idx)

    K = get_intrinsic(camera)
    E = get_extrinsics(camera)
    val = prd_evaluation(
        exp.pair_list, exp.match_cache, rays_eval, K, E,
        mode="train", method="NeRF",
        max_matches=exp.cfg.camera.match_num,
        threshold=exp.cfg.camera.proj_ray_dist_threshold,
    )
    return {"prd": val} if np.isfinite(val) else {}


def _eval_split_matches(exp: NerfExperiment, split: np.ndarray):
    """Feasible pairs + correspondences between the eval-split images,
    built once and cached on the experiment (split-local indices)."""
    if exp.eval_pair_list is not None:
        return exp.eval_pair_list, exp.eval_match_cache
    pairs = image_pair_candidates(
        exp.gt_poses[split], exp.cfg.camera.pairing_angle_threshold
    )
    pair_list = flatten_pairs(pairs)
    cache = PrecomputedMatches()
    if len(pair_list) and sift_available():
        cache = build_match_cache(exp.images[split], pair_list, SIFTMatcher())
    exp.eval_pair_list, exp.eval_match_cache = pair_list, cache
    return pair_list, cache


def evaluate_prd_split(exp: NerfExperiment, mode: str = "val",
                       split: np.ndarray | None = None) -> dict:
    """GT-filtered PRD over the held-out split — the reference's headline
    calibration-metric protocol (``model/prd_evaluation.py:66-216,223-332``):

    - feasible pairs among the split's images (GT poses, angle threshold);
    - keep only matches the GT camera triangulates to < 1 px reprojection
      error both ways with positive ray parameters;
    - PRD in clamp mode with the evaluated camera's intrinsics/noise but the
      GT extrinsic for each view (the reference passes ``extrinsic=gt`` to
      the camera ray function and ``proj_ray_dist_loss_single`` at val/test).
    """
    assert mode in ("val", "test")
    from scnerf_tpu.camera.model import get_intrinsic
    from scnerf_tpu.losses.prd_eval import prd_evaluation

    split = np.asarray(exp.i_test if split is None else split)
    if len(split) < 2:
        return {}
    pair_list, cache = _eval_split_matches(exp, split)
    if len(pair_list) == 0 or cache is None:
        return {}

    camera = exp.state.params.get("camera")
    gt_E = exp.gt_poses[split]
    gt_focal = float(exp.gt_intrinsic[0, 0])

    def rays_gt(kps, local_idx):
        return rays_no_camera(
            exp.H, exp.W, gt_focal, jnp.asarray(gt_E[local_idx]),
            kps[:, 0], kps[:, 1],
        )

    if camera is not None:
        K_eval = get_intrinsic(camera)

        def rays_eval(kps, local_idx):
            return pixels_to_rays(
                camera, kps[:, 0], kps[:, 1], c2w=jnp.asarray(gt_E[local_idx])
            )
    else:
        K_eval = jnp.asarray(exp.gt_intrinsic)

        def rays_eval(kps, local_idx):
            return rays_no_camera(
                exp.H, exp.W, exp.noisy_focal, jnp.asarray(gt_E[local_idx]),
                kps[:, 0], kps[:, 1],
            )

    val = prd_evaluation(
        pair_list, cache, rays_eval, K_eval, gt_E,
        mode=mode, method="NeRF",
        rays_gt=rays_gt, gt_K=exp.gt_intrinsic, gt_E=gt_E,
        max_matches=exp.cfg.camera.match_num,
        threshold=exp.cfg.camera.proj_ray_dist_threshold,
    )
    return {f"prd_{mode}": val} if np.isfinite(val) else {}


def aligned_eval_extrinsic(exp: NerfExperiment, image_idx: int) -> jnp.ndarray:
    """Pose for rendering a val/test view with the learned camera.

    The reference aligns the learned train poses to the GT train poses with a
    Sim(3) (ATE alignment) and transports the GT val/test pose into the
    learned frame (``run_nerf.py:646-660``).
    """
    camera: Camera = exp.state.params["camera"]
    learned_train = np.asarray(get_extrinsics(camera))
    gt_train = exp.gt_poses[exp.i_train]
    _, (s, R, t) = align_c2w_trajectories(jnp.asarray(gt_train), jnp.asarray(learned_train))
    aligned = apply_sim3(jnp.asarray(exp.gt_poses[image_idx : image_idx + 1]), s, R, t)
    return aligned[0]


def render_image(exp: NerfExperiment, c2w, key=None, camera_rays: bool = True):
    """Full-image render returning (H, W, 3) rgb + aux maps."""
    key = key if key is not None else jax.random.key(0)
    eval_cfg = exp.render_cfg.eval_mode()
    camera = exp.state.params.get("camera")
    py, px = np.mgrid[0 : exp.H, 0 : exp.W]
    px = jnp.asarray(px.reshape(-1), jnp.float32)
    py = jnp.asarray(py.reshape(-1), jnp.float32)
    if camera is not None and camera_rays:
        rays_o, rays_d = pixels_to_rays(camera, px, py, c2w=jnp.asarray(c2w))
    else:
        rays_o, rays_d = rays_no_camera(
            exp.H, exp.W, exp.noisy_focal, jnp.asarray(c2w), px, py
        )
    viewdirs = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
    if exp.train_cfg.use_ndc:
        from scnerf_tpu.geometry.ndc import ndc_rays

        if camera is not None:
            K = get_intrinsic(camera)
            fx, fy = K[0, 0], K[1, 1]
        else:
            fx = fy = exp.noisy_focal
        rays_o, rays_d = ndc_rays(exp.H, exp.W, fx, fy, 1.0, rays_o, rays_d)
    out = render_chunked(
        exp.state.params, exp.model_cfg, eval_cfg, rays_o, rays_d, viewdirs,
        exp.near, exp.far, key,
    )
    out = {k: np.asarray(v).reshape((exp.H, exp.W) + v.shape[1:]) for k, v in out.items()}
    # batchify_rays clamps rgb >= 1 (render.py:404-406); metrics match.
    for k in ("rgb", "rgb0"):
        if k in out:
            out[k] = np.minimum(out[k], 1.0)
    return out


def evaluate_test_views(exp: NerfExperiment, max_views: int | None = None) -> dict:
    """PSNR/SSIM[/LPIPS] over the test split (ATE-aligned when a camera is
    learned). LPIPS is reported when VGG16 weights are available
    (``metrics/lpips.py``; the reference always reports it via piqa,
    ``run_nerf.py:789-800``)."""
    from scnerf_tpu.metrics.lpips import lpips, lpips_available, load_weights

    lpips_w = load_weights() if lpips_available() else None
    psnrs, ssims, lpipss = [], [], []
    views = exp.i_test[:max_views] if max_views else exp.i_test
    for idx in views:
        if exp.state.params.get("camera") is not None:
            c2w = aligned_eval_extrinsic(exp, int(idx))
        else:
            c2w = exp.gt_poses[int(idx)]
        out = render_image(exp, c2w)
        target = exp.images[int(idx)]
        mse = float(img2mse(jnp.asarray(out["rgb"]), jnp.asarray(target)))
        psnrs.append(float(mse2psnr(jnp.asarray(mse))))
        ssims.append(float(ssim(jnp.asarray(out["rgb"]), jnp.asarray(target))))
        if lpips_w is not None:
            lpipss.append(float(lpips(jnp.asarray(out["rgb"]),
                                      jnp.asarray(target), lpips_w)))
    res = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "n_views": len(psnrs)}
    if lpipss:
        res["lpips"] = float(np.mean(lpipss))
    return res
