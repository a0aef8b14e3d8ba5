"""Trajectory-parity harness: scnerf-tpu vs the ACTUAL torch reference.

Round-1 VERDICT item 2: the 0.1 dB PSNR target needs end-to-end evidence, not
just per-function oracles. This harness executes the strongest proxy that
runs without real datasets:

1. Builds a tiny LLFF-format scene on disk (procedural images, valid poses).
2. Initialises OUR model, converts the weights to a reference checkpoint
   (``tools/convert.py:params_to_torch_nerf``) and starts the REAL reference
   trainer (``/root/reference/NeRF/run_nerf.py:82``, torch-cpu, via
   ``scripts/_ref_driver.py``) from them with ``--ft_path``.
3. Runs our trainer from the same weights on the same scene.
4. Compares the per-step loss trajectories and the final weights.

Determinism without shared RNG: ONE training image (2 images, llffhold 8 →
i_test=[0], i_train=[1]) makes the reference's random image pick constant,
and ``N_rand = H*W`` makes its no-replacement pixel choice a permutation —
the mean MSE and its gradient are permutation-invariant. ``perturb=0`` and
``raw_noise_std=0`` remove the remaining sampling noise, so both trainers
are exactly deterministic and comparable step-for-step.

Horizon note: ~200 steps is the meaningful window. Past full convergence on
these tiny scenes (~1000 steps, 44 dB, MSE ~4e-5) f32 Adam chaos fully
decorrelates the two trajectories and per-step comparison measures noise
between two equivalently-converged runs (measured: step-0 match 8e-6,
final quality 43.4 vs 44.0 dB — a 0.6 dB gap that corresponds to an MSE
delta below sensor noise). Compare in the mid-training regime where PSNR
differences are attributable.

Regimes (flags compose where the reference's do):
  (none)          plain fixed-camera LLFF
  --camera        learnable camera (self-calibration)
  --ndc           NDC space (the reference's LLFF default)
  --prd           camera + projected-ray-distance loss (full RNG replay)
  --blender       blender pipeline (white bkgd, near/far 2/6)
  --custom_optim  demo.sh's CustomAdam (weight decay on camera noise)
  --batching      use_batching + camera: shuffled global pixel pool
  --batching --ndc  the EXACT published fern default flag set
  --scratch       main_table_1 from-scratch (run_without_colmap both)
  --noise         injected camera noise with the loader RNG replayed
  --precrop       early center-crop phase (two-phase draw replay)
  --fullnoise     TRUE fern training semantics: perturb=1 +
                  raw_noise_std=1 + non-det inverse-CDF, torch stream
                  replayed and injected (the tightest regime: common
                  random numbers couple the trajectories)
  --render        plus per-pixel end-of-training render comparison

Usage: python scripts/ref_parity.py [--steps 200] [--out PARITY_TRAJ.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, FOCAL = 24, 32, 28.0
N_IMAGES = 2
TEXTURE = False  # PRD mode: high-frequency texture so SIFT finds matches
NEAR_FAR_FROM_BDS = True
MLP = dict(depth=8, width=64, skips=(4,), multires=10, multires_views=4)
SAMPLES = dict(n_samples=12, n_importance=12)
LR, LR_DECAY = 5e-4, 250  # reference units: decay_steps = lrate_decay * 1000
WEIGHT_DECAY = 0.1  # --custom_optim regime: demo.sh's non_linear_weight_decay
N_RAND_BATCHING = 256  # --batching regime: divides 2*H*W so no short batch
# --noise regime: the calibration_ablation protocol's injected noise sizes
NOISE_SIZES = dict(intrinsic=0.1, rotation=2.0, translation=0.05)
N_RAND_PRECROP = 192  # --precrop regime: < the center-crop pixel count
# --fullnoise regime ray count; None = H*W (the toy permutation setup).
# scripts/ref_parity_fullshape.py sets 1024 (the published fern N_rand) —
# determinism then comes from replaying the no-replacement pixel draw
# itself, not from permutation invariance.
N_RAND_FULLNOISE: int | None = None
REF_TIMEOUT = 3600  # reference-subprocess budget; raised for full shapes


def scene_image(i: int) -> np.ndarray:
    """Deterministic smooth test card, different per view."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    u, v = xx / W, yy / H
    img = np.stack(
        [
            0.5 + 0.45 * np.sin(2 * np.pi * (u + 0.31 * i)),
            0.5 + 0.45 * np.cos(2 * np.pi * (v - 0.17 * i)),
            0.35 + 0.35 * np.sin(2 * np.pi * (u + v + 0.11 * i)),
        ],
        -1,
    )
    if TEXTURE:
        # one fixed random texture, translated per view: dense, repeatable
        # SIFT correspondences with a plausible dominant motion.
        tex_rng = np.random.RandomState(99)
        base = tex_rng.rand(H, W * 2, 3)
        img = 0.35 * img + 0.65 * base[:, 2 * i : 2 * i + W]
    return np.clip(img * 255.0, 0, 255).round().astype(np.uint8)


def build_scene(scene_dir: str) -> None:
    """LLFF layout: images/, images_1/ (pre-made so the reference's _minify
    never shells out to ImageMagick), poses_bounds.npy."""
    import imageio.v2 as imageio

    for sub in ("images", "images_1"):
        os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
    poses = np.zeros((N_IMAGES, 3, 5))
    for i in range(N_IMAGES):
        u8 = scene_image(i)
        for sub in ("images", "images_1"):
            imageio.imwrite(os.path.join(scene_dir, sub, f"im_{i:02d}.png"), u8)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.15 * i - 0.07, 0.08 * i - 0.04, 4.0 + 0.05 * i]
        # disk layout columns: [down, right, back]
        poses[i, :, :4] = np.stack(
            [-c2w[:3, 1], c2w[:3, 0], c2w[:3, 2], c2w[:3, 3]], axis=1
        )
        poses[i, :, 4] = [H, W, FOCAL]
    bounds = np.stack([np.full(N_IMAGES, 2.0), np.full(N_IMAGES, 8.0)], -1)
    np.save(
        os.path.join(scene_dir, "poses_bounds.npy"),
        np.concatenate([poses.reshape(N_IMAGES, -1), bounds], -1),
    )


def build_blender_scene(scene_dir: str) -> None:
    """Blender layout: transforms_{train,val,test}.json + RGBA pngs.
    One train image (deterministic image pick), alpha gradient so the
    white-background compositing path is genuinely exercised."""
    import imageio.v2 as imageio

    from scnerf_tpu.data.blender import pose_spherical

    os.makedirs(scene_dir, exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    for split, angles in [("train", [30.0]), ("val", [80.0]), ("test", [130.0])]:
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        frames = []
        for i, ang in enumerate(angles):
            pose = np.array(pose_spherical(ang, -30.0, 4.0))
            rgb = scene_image(i)
            alpha = np.clip(
                255.0 * (0.5 + 0.5 * np.sin(2 * np.pi * (xx / W - yy / H))), 0, 255
            ).astype(np.uint8)
            rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
            imageio.imwrite(os.path.join(scene_dir, split, f"r_{i}.png"), rgba)
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": pose.tolist()})
        json.dump({"camera_angle_x": 0.69, "frames": frames},
                  open(os.path.join(scene_dir, f"transforms_{split}.json"), "w"))


def make_init_params():
    import jax

    from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp

    cfg = NeRFConfig(**MLP)
    key = jax.random.key(1234)
    return cfg, {
        "coarse": init_nerf_mlp(key, cfg),
        "fine": init_nerf_mlp(jax.random.fold_in(key, 1), cfg),
    }


def write_init_ckpt(params, path: str) -> None:
    import torch

    from scnerf_tpu.tools.convert import params_to_torch_nerf

    ckpt = {
        "global_step": 0,
        "network_fn_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_torch_nerf(params["coarse"]).items()
        },
        "network_fine_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_torch_nerf(params["fine"]).items()
        },
        "optimizer_state_dict": {"state": {}},
    }
    torch.save(ckpt, path)


def reference_sift_matches(img0: np.ndarray, img1: np.ndarray):
    """Correspondences via the REFERENCE's own SIFT pipeline, imported as an
    oracle module (model/reprojection.py runSIFTSinglePair + ray_dist_loss
    preprocess_match) so both trainers see bit-identical matches."""
    import importlib.util
    import types

    import cv2 as cv
    import torch

    os.environ.setdefault("MPLBACKEND", "Agg")
    for name in ("thirdparty", "thirdparty.superglue", "thirdparty.superglue.models",
                 "thirdparty.superglue.models.matching"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith("matching"):
                mod.Matching = object
            sys.modules[name] = mod

    def load(path, name):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/model")
    try:
        repro = load("/root/reference/model/reprojection.py", "_refp_reprojection")
        rdl = load("/root/reference/model/ray_dist_loss.py", "_refp_ray_dist_loss")
    finally:
        sys.path.pop(0)
        sys.path.pop(0)
    result = repro.runSIFTSinglePair(
        cv.SIFT_create(), torch.from_numpy(img0), torch.from_numpy(img1), "cpu", None
    )
    pm = rdl.preprocess_match(result)
    if pm is None or pm[0] is None:
        return None
    return (pm[0].numpy().astype(np.float32), pm[1].numpy().astype(np.float32))


def run_reference(scene_dir: str, n_steps: int, init_tar: str, workdir: str,
                  camera: bool = False, ndc: bool = False, prd: bool = False,
                  blender: bool = False, custom_optim: bool = False,
                  batching: bool = False, scratch: bool = False,
                  noise: bool = False, render_check: bool = False,
                  precrop: bool = False, fullnoise: bool = False):
    """Run the real reference trainer in a subprocess; returns (mse (n,2)
    fine/coarse, final coarse+fine[+camera] params in OUR layout)."""
    out_npz = os.path.join(workdir, "ref_out.npz")
    if blender:
        ds_flags = ["--dataset_type", "blender", "--testskip", "1",
                    "--white_bkgd", "--no_ndc"]
    else:
        ds_flags = (["--dataset_type", "llff", "--factor", "1",
                     "--llffhold", "8"] + ([] if ndc else ["--no_ndc"]))
    flags = [
        "--expname", "parity", "--basedir", workdir, "--datadir", scene_dir,
        "--use_viewdirs",
    ] + ([] if batching else ["--no_batching"]) + ds_flags + [
        "--netdepth", str(MLP["depth"]), "--netwidth", str(MLP["width"]),
        "--netdepth_fine", str(MLP["depth"]), "--netwidth_fine", str(MLP["width"]),
        "--multires", str(MLP["multires"]),
        "--multires_views", str(MLP["multires_views"]),
        "--N_rand", str(N_RAND_PRECROP if precrop
                        else N_RAND_BATCHING if batching
                        else (N_RAND_FULLNOISE or H * W) if fullnoise
                        else H * W),
        "--N_samples", str(SAMPLES["n_samples"]),
        "--N_importance", str(SAMPLES["n_importance"]),
        "--perturb", "1.0" if fullnoise else "0.0",
        "--raw_noise_std", "1.0" if fullnoise else "0.0",
        "--lrate", str(LR), "--lrate_decay", str(LR_DECAY),
        "--chunk", "32768", "--netchunk_per_gpu", "65536",
        "--N_iters", str(n_steps + 1),
        "--precrop_iters", str(n_steps // 2 + 1 if precrop else 0),
        "--precrop_frac", "0.5",
        "--i_print", "1000000", "--i_img", "1000000",
        "--i_testset", "1000000", "--i_video", "1000000",
        "--i_weights", str(n_steps),
        "--ray_loss_type", "none",
        "--camera_model",
        "pinhole_rot_noise_10k_rayo_rayd" if camera else "none",
        "--matcher", "sift", "--seed", "777", "--ft_path", init_tar,
    ]
    if camera:
        # Full curriculum active from step 0.
        flags += ["--add_ie", "0", "--add_od", "0", "--grid_size", "10",
                  "--add_prd", "0" if prd else "10000000"]
    if prd:
        i = flags.index("none", flags.index("--ray_loss_type"))
        flags[i] = "proj_ray_dist"
        flags += ["--i_ray_dist_loss", "10", "--ray_dist_loss_weight", "0.0001",
                  "--pairing_angle_threshold", "30"]
    if custom_optim:
        # demo.sh's canonical optimizer: CustomAdamOptimizer with L2-in-grad
        # decay on the trailing rayo/rayd noise params
        # (create_nerf.py:199-336; demo.sh --non_linear_weight_decay 0.1).
        flags += ["--use_custom_optim", "True",
                  "--non_linear_weight_decay", str(WEIGHT_DECAY)]
    if scratch:
        # main_table_1 "from scratch" protocol: train poses wiped to
        # identity R / zero t (load_llff.py:347-360) and the camera seeded
        # at fx=W, fy=H, cx=W/2, cy=H/2 (create_nerf.py:97-109).
        flags += ["--run_without_colmap", "both"]
    if noise:
        # Synthetic noise injection (load_llff.py:318-345): focal scaled by
        # (1+s) on train rows, random axis-angle rotation, uniform
        # translation — drawn from the fresh seed-777 np stream.
        flags += ["--initial_noise_size_intrinsic", str(NOISE_SIZES["intrinsic"]),
                  "--initial_noise_size_rotation", str(NOISE_SIZES["rotation"]),
                  "--initial_noise_size_translation", str(NOISE_SIZES["translation"])]
    spec = {"flags": flags, "n_steps": n_steps, "out_npz": out_npz,
            "workdir": workdir, "record_renders": bool(render_check)}
    spec_path = os.path.join(workdir, "ref_spec.json")
    json.dump(spec, open(spec_path, "w"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ref_driver.py"), spec_path],
        capture_output=True, text=True, timeout=REF_TIMEOUT,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError(f"reference trainer failed rc={r.returncode}")
    data = np.load(out_npz)
    mse = data["mse"].reshape(n_steps, 2)  # per step: [fine, coarse]

    from scnerf_tpu.tools.convert import torch_nerf_to_params

    def grab(tag):
        sd = {k[len(tag) + 2:]: data[k] for k in data.files if k.startswith(tag + "::")}
        return torch_nerf_to_params(sd, depth=MLP["depth"]) if sd else None

    final = {"coarse": grab("fn"), "fine": grab("fine")}
    if "render::train0" in data.files:
        final["render::train0"] = data["render::train0"]
    cam_sd = {k[5:]: data[k] for k in data.files if k.startswith("cam::")}
    if cam_sd:
        from scnerf_tpu.tools.convert import torch_camera_to_fields

        final["camera_fields"] = torch_camera_to_fields(cam_sd)
    return mse, final


def run_ours(scene_dir: str, n_steps: int, model_cfg, init_params,
             camera: bool = False, ndc: bool = False, prd: bool = False,
             blender: bool = False, custom_optim: bool = False,
             batching: bool = False, scratch: bool = False,
             noise: bool = False, precrop: bool = False,
             fullnoise: bool = False):
    """Run our trainer on the identical workload; returns (loss, psnr,
    final params). ``loss`` is the PHOTOMETRIC part (fine + coarse mse),
    matching what the reference-side tap records."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import rays_no_camera
    from scnerf_tpu.data.llff import load_llff
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    if blender:
        return _run_ours_blender(scene_dir, n_steps, model_cfg, init_params)
    noise_cfg, noise_rng = None, None
    if scratch:
        from scnerf_tpu.data.noise import NoiseConfig

        noise_cfg = NoiseConfig(run_without_colmap="both")
    if noise:
        from scnerf_tpu.data.noise import NoiseConfig

        # identical stream to the reference loader: fresh seed-777 numpy
        noise_cfg = NoiseConfig(intrinsic_scale=NOISE_SIZES["intrinsic"],
                                rotation_deg=NOISE_SIZES["rotation"],
                                translation=NOISE_SIZES["translation"])
        noise_rng = np.random.RandomState(777)
    d = load_llff(scene_dir, factor=1, llffhold=8, noise=noise_cfg,
                  rng=noise_rng)
    if prd:
        return _run_ours_prd(d, n_steps, model_cfg, init_params)
    if batching:
        return _run_ours_batching(d, n_steps, model_cfg, init_params, ndc=ndc)
    if precrop:
        return _run_ours_precrop(d, n_steps, model_cfg, init_params)
    if fullnoise:
        return _run_ours_fullnoise(d, n_steps, model_cfg, init_params)
    (train_idx,) = [int(i) for i in d.i_train]
    if ndc:
        near, far = 0.0, 1.0  # load_llff_data's NDC bounds (run_nerf.py:148-149)
    else:
        near = float(d.bds.min()) * 0.9
        far = float(d.bds.max())

    idx = np.arange(H * W)
    px, py = (idx % W).astype(np.float32), (idx // W).astype(np.float32)
    if camera:
        # Learnable camera over the train split, initialised exactly like
        # the reference's create_nerf camera path (noisy K/E, zero noises;
        # colmap-free: fx=W, fy=H — create_nerf.py:97-109).
        from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera

        K_init = d.gt_intrinsic.copy()
        if scratch:
            K_init[0, 0], K_init[1, 1] = float(W), float(H)
        else:
            K_init[0, 0] = K_init[1, 1] = d.noisy_focal
        cam = init_camera(
            K_init, d.noisy_poses[[train_idx]],
            # NeRF-pipeline reference defaults (config_argparse.py):
            # ray noise 1e-4, extrinsics/intrinsics noise scale 1.0.
            CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                         ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                         extrinsics_noise_scale=1.0, intrinsics_noise_scale=1.0),
        )
        init_params = dict(init_params, camera=cam)
        batch = {
            "px": jnp.asarray(px),
            "py": jnp.asarray(py),
            "img_idx": jnp.zeros((H * W,), jnp.int32),
            "target": jnp.asarray(d.images[train_idx].reshape(-1, 3)),
        }
    else:
        rays_o, rays_d = rays_no_camera(
            H, W, d.noisy_focal, jnp.asarray(d.noisy_poses[train_idx, :3, :4]), px, py
        )
        batch = {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "target": jnp.asarray(d.images[train_idx].reshape(-1, 3)),
        }
        if ndc:
            batch.update(focal=d.noisy_focal, H=H, W=W)

    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True,
    )
    train_cfg = TrainConfig(
        lr_init=LR, lr_decay_steps=LR_DECAY * 1000, near=near, far=far,
        use_ndc=ndc,
    )
    params = dict(init_params)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params,
                        weight_decay=WEIGHT_DECAY if custom_optim else 0.0)
    state = create_train_state(params, tx)
    from scnerf_tpu.train.curriculum import Curriculum

    step = make_train_step(
        model_cfg, render_cfg, train_cfg, Curriculum(), tx, with_prd=False,
        donate=False,
    )
    losses, psnrs = [], []
    key = jax.random.key(0)
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
        psnrs.append(float(metrics["psnr"]))
    return np.asarray(losses), np.asarray(psnrs), state.params


def _run_ours_blender(scene_dir: str, n_steps: int, model_cfg, init_params):
    """Blender-pipeline workload: white-background compositing, near/far
    2/6 (run_nerf.py:151-170), single train image."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import rays_no_camera
    from scnerf_tpu.data.blender import load_blender
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    d = load_blender(scene_dir, half_res=False, testskip=1)
    i_train = d.i_split[0]
    (train_idx,) = [int(i) for i in i_train]
    images = d.images[..., :3] * d.images[..., 3:] + (1.0 - d.images[..., 3:])

    idx = np.arange(H * W)
    px, py = (idx % W).astype(np.float32), (idx // W).astype(np.float32)
    rays_o, rays_d = rays_no_camera(
        H, W, d.noisy_focal, jnp.asarray(d.noisy_poses[train_idx, :3, :4]), px, py
    )
    batch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "target": jnp.asarray(images[train_idx].reshape(-1, 3), jnp.float32),
    }
    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True, white_bkgd=True,
    )
    train_cfg = TrainConfig(lr_init=LR, lr_decay_steps=LR_DECAY * 1000,
                            near=2.0, far=6.0, use_ndc=False)
    params = dict(init_params)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params)
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx,
                           with_prd=False, donate=False)
    losses, psnrs = [], []
    key = jax.random.key(0)
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
        psnrs.append(float(metrics["psnr"]))
    return np.asarray(losses), np.asarray(psnrs), state.params


def _run_ours_precrop(d, n_steps: int, model_cfg, init_params):
    """Per-image sampling with the early center-crop phase
    (``run_nerf.py:408-478``): for the first ``precrop_iters`` steps pixels
    come from a joint no-replacement draw over the CENTER-CROP grid (frac
    0.5), then over the full grid. All draws are numpy — replayed exactly:
    per step one ``choice(i_train)`` then one
    ``choice(count, [N_rand], replace=False)`` over the x-major meshgrid
    flat coords."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    i_train = np.asarray(d.i_train)
    local = {int(g): li for li, g in enumerate(i_train)}
    near = float(d.bds.min()) * 0.9
    far = float(d.bds.max())
    K_init = d.gt_intrinsic.copy()
    K_init[0, 0] = K_init[1, 1] = d.noisy_focal
    cam = init_camera(
        K_init, d.noisy_poses[i_train],
        CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                     ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                     extrinsics_noise_scale=1.0, intrinsics_noise_scale=1.0),
    )
    params = dict(init_params, camera=cam)
    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True,
    )
    train_cfg = TrainConfig(lr_init=LR, lr_decay_steps=LR_DECAY * 1000,
                            near=near, far=far, use_ndc=False)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(),
                              tx, with_prd=False, donate=False)

    precrop_iters = n_steps // 2 + 1  # ref loop i runs 1..n_steps; i < this
    n_rand = N_RAND_PRECROP
    np.random.seed(777)  # fix_seeds(777)
    losses, psnrs = [], []
    key = jax.random.key(0)
    n_crop_steps = 0
    for it in range(n_steps):
        i_ref = it + 1  # the reference's loop variable
        img_i = int(np.random.choice(i_train))
        if i_ref < precrop_iters:
            dH = int(H // 2 * 0.5)
            dW = int(W // 2 * 0.5)
            xs = np.arange(W // 2 - dW, W // 2 + dW)
            ys = np.arange(H // 2 - dH, H // 2 + dH)
            n_crop_steps += 1
        else:
            xs, ys = np.arange(W), np.arange(H)
        sel = np.random.choice(len(xs) * len(ys), size=[n_rand], replace=False)
        px = xs[sel // len(ys)].astype(np.float32)
        py = ys[sel % len(ys)].astype(np.float32)
        batch = {
            "px": jnp.asarray(px),
            "py": jnp.asarray(py),
            "img_idx": jnp.full((n_rand,), local[img_i], jnp.int32),
            "target": jnp.asarray(
                d.images[img_i][py.astype(int), px.astype(int)], jnp.float32),
        }
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, it))
        losses.append(float(metrics["mse"]) + float(metrics["mse0"]))
        psnrs.append(float(metrics["psnr"]))
    assert n_crop_steps > 0 and n_crop_steps < n_steps, n_crop_steps
    print(f"[ref_parity] precrop regime: {n_crop_steps} cropped steps, "
          f"{n_steps - n_crop_steps} full-grid steps")
    return np.asarray(losses), np.asarray(psnrs), state.params


def _run_ours_fullnoise(d, n_steps: int, model_cfg, init_params):
    """The TRUE stochastic fern semantics: ``perturb=1`` stratified jitter,
    ``raw_noise_std=1`` sigma regularizer, non-deterministic inverse-CDF —
    with the reference's torch stream replayed draw-for-draw and injected
    into our jitted step (``render_rays(rands=...)``).

    Stream alignment: ``fix_seeds(777)`` seeds torch BEFORE ``create_nerf``
    constructs the coarse+fine torch modules (xavier draws), so the
    harness reproduces those exact constructions via the reference's own
    ``run_nerf_helpers.NeRF`` before replaying the per-step draws. Per
    reference step (render.py:186-300, one chunk at chunk=32768):
    ``t_rand`` (N, S) uniform -> ``noise0`` (N, S) normal -> ``u``
    (N, S_imp) uniform -> ``noise1`` (N, S+S_imp) normal, all in the RAY
    order given by the replayed no-replacement pixel permutation over the
    x-major coordinate grid — scattered back to our pixel-order batch.
    """
    import importlib.util

    import jax
    import jax.numpy as jnp
    import torch

    from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    i_train = np.asarray(d.i_train)
    local = {int(g): li for li, g in enumerate(i_train)}
    near = float(d.bds.min()) * 0.9
    far = float(d.bds.max())
    K_init = d.gt_intrinsic.copy()
    K_init[0, 0] = K_init[1, 1] = d.noisy_focal
    cam = init_camera(
        K_init, d.noisy_poses[i_train],
        CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                     ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                     extrinsics_noise_scale=1.0, intrinsics_noise_scale=1.0),
    )
    params = dict(init_params, camera=cam)
    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=True, raw_noise_std=1.0, use_viewdirs=True, pdf_impl="xla",
    )
    train_cfg = TrainConfig(lr_init=LR, lr_decay_steps=LR_DECAY * 1000,
                            near=near, far=far, use_ndc=False)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(),
                              tx, with_prd=False, donate=False)

    # --- torch stream alignment: replicate create_nerf's init draws ------
    spec = importlib.util.spec_from_file_location(
        "_ref_helpers", "/root/reference/NeRF/run_nerf_helpers.py")
    helpers = importlib.util.module_from_spec(spec)
    sys.modules["_ref_helpers"] = helpers
    spec.loader.exec_module(helpers)
    helpers.fix_seeds(777)
    in_ch = 3 + 3 * 2 * MLP["multires"]
    in_ch_views = 3 + 3 * 2 * MLP["multires_views"]
    for _ in range(2):  # coarse then fine (create_nerf.py:53-65)
        helpers.NeRF(D=MLP["depth"], W=MLP["width"], input_ch=in_ch,
                     output_ch=5, skips=list(MLP["skips"]),
                     input_ch_views=in_ch_views, use_viewdirs=True)
    np.random.seed(777)  # fix_seeds seeded np too; restate for clarity

    n = H * W
    n_rand = N_RAND_FULLNOISE or n
    S, S_imp = SAMPLES["n_samples"], SAMPLES["n_importance"]
    px_all = jnp.asarray((np.arange(n) % W).astype(np.float32))
    py_all = jnp.asarray((np.arange(n) // W).astype(np.float32))
    losses, psnrs = [], []
    key = jax.random.key(0)
    for it in range(n_steps):
        img_i = int(np.random.choice(i_train))
        sel = np.random.choice(n, size=[n_rand], replace=False)
        if n_rand == n:
            # Toy setup: the draw is a permutation of ALL pixels, so feed
            # the full image in row-major order and scatter the replayed
            # rands from ray order to pixel order.
            # ray p sits at x-major flat coord sel[p] -> row-major index
            pix = (sel % H) * W + (sel // H)

            def scatter(a):
                b = np.empty_like(a)
                b[pix] = a
                return jnp.asarray(b)

            t_rand = scatter(torch.rand(n, S).numpy())
            noise0 = scatter(torch.randn(n, S).numpy())
            u = scatter(torch.rand(n, S_imp).numpy())
            noise1 = scatter(torch.randn(n, S + S_imp).numpy())
            batch = {
                "px": px_all,
                "py": py_all,
                "img_idx": jnp.full((n,), local[img_i], jnp.int32),
                "target": jnp.asarray(d.images[img_i].reshape(-1, 3)),
                "rands": {"t": t_rand, "noise0": noise0,
                          "u": u, "noise1": noise1},
            }
        else:
            # Full-shape setup (N_rand < H*W, the published fern batch
            # size): feed exactly the drawn pixels IN THE REFERENCE'S RAY
            # ORDER, so the replayed torch draws align per-ray with no
            # scatter. The mean loss over the identical pixel set is
            # order-invariant, so both objectives match exactly.
            x = sel // H  # x-major flat coords (camera-branch meshgrid)
            y = sel % H
            batch = {
                "px": jnp.asarray(x.astype(np.float32)),
                "py": jnp.asarray(y.astype(np.float32)),
                "img_idx": jnp.full((n_rand,), local[img_i], jnp.int32),
                "target": jnp.asarray(d.images[img_i][y, x], jnp.float32),
                "rands": {
                    "t": jnp.asarray(torch.rand(n_rand, S).numpy()),
                    "noise0": jnp.asarray(torch.randn(n_rand, S).numpy()),
                    "u": jnp.asarray(torch.rand(n_rand, S_imp).numpy()),
                    "noise1": jnp.asarray(
                        torch.randn(n_rand, S + S_imp).numpy()),
                },
            }
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, it))
        losses.append(float(metrics["mse"]) + float(metrics["mse0"]))
        psnrs.append(float(metrics["psnr"]))
    return np.asarray(losses), np.asarray(psnrs), state.params


def _run_ours_batching(d, n_steps: int, model_cfg, init_params,
                       ndc: bool = False):
    """use_batching + camera — the PUBLISHED LLFF main-table sampling path
    (``run_nerf.py:303-305,369-407``): a globally shuffled pool of flat
    pixel indices decoded per step into per-ray (train-image idx, pixel)
    triples cast through the differentiable camera; epoch exhaustion
    reshuffles IN the numpy stream.

    Deterministic by RNG replay: the reference's np stream after
    ``fix_seeds(777)`` (the loader draws nothing at zero injected noise) is
    one setup ``shuffle``, then per step one ``choice(index_train)`` (its
    ``img_i`` log/PRD pick — drawn even without PRD) and, on epoch
    boundaries, a reshuffle. N_rand divides the pool so the reference's
    short-tail-batch branch never triggers.
    """
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    i_train = np.asarray(d.i_train)
    if ndc:
        near, far = 0.0, 1.0  # load_llff_data's NDC bounds (run_nerf.py:148-149)
    else:
        near = float(d.bds.min()) * 0.9
        far = float(d.bds.max())
    K_init = d.gt_intrinsic.copy()
    K_init[0, 0] = K_init[1, 1] = d.noisy_focal
    cam = init_camera(
        K_init, d.noisy_poses[i_train],
        CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                     ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                     extrinsics_noise_scale=1.0, intrinsics_noise_scale=1.0),
    )
    params = dict(init_params, camera=cam)
    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True,
    )
    train_cfg = TrainConfig(lr_init=LR, lr_decay_steps=LR_DECAY * 1000,
                            near=near, far=far, use_ndc=ndc)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(),
                              tx, with_prd=False, donate=False)

    n_total = len(i_train) * H * W
    n_rand = N_RAND_BATCHING
    assert n_total % n_rand == 0, (n_total, n_rand)
    np.random.seed(777)  # fix_seeds(777): replay the reference's np stream
    shuffled = np.arange(n_total)
    np.random.shuffle(shuffled)
    i_batch = 0
    epochs = 0
    losses, psnrs = [], []
    key = jax.random.key(0)
    for it in range(n_steps):
        sl = shuffled[i_batch : i_batch + n_rand]
        ci = (sl // (H * W)).astype(np.int32)  # camera-table (train) index
        rem = sl % (H * W)
        py = (rem // W).astype(np.float32)
        px = (rem % W).astype(np.float32)
        target = d.images[i_train[ci], py.astype(int), px.astype(int)]
        np.random.choice(i_train[ci])  # RNG-advance: the reference's img_i
        i_batch += n_rand
        if i_batch >= n_total:
            np.random.shuffle(shuffled)
            i_batch = 0
            epochs += 1
        batch = {
            "px": jnp.asarray(px),
            "py": jnp.asarray(py),
            "img_idx": jnp.asarray(ci),
            "target": jnp.asarray(target, jnp.float32),
        }
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, it))
        losses.append(float(metrics["mse"]) + float(metrics["mse0"]))
        psnrs.append(float(metrics["psnr"]))
    if epochs == 0:
        if n_steps * n_rand >= n_total:
            raise RuntimeError("batching parity run never exhausted an epoch "
                               "— the reshuffle path went unexercised.")
        # Short-horizon run (e.g. the in-suite fullshape guard): the
        # reshuffle path is already pinned by the toy-shape regime.
        print("[ref_parity] batching regime: horizon shorter than one "
              "epoch; reshuffle exercised by the toy regime instead")
    else:
        print(f"[ref_parity] batching regime: {epochs} epoch reshuffles "
              f"replayed")
    return np.asarray(losses), np.asarray(psnrs), state.params


def _run_ours_prd(d, n_steps: int, model_cfg, init_params):
    """Flagship-regime replication: multi-image training with the learnable
    camera AND the projected-ray-distance loss.

    Exactness here needs two reproductions of the reference run:

    - **RNG replay.** The reference seeds numpy (fix_seeds(777)) and draws,
      per iteration: the training image, the no-replacement pixel
      permutation (irrelevant to the mean loss, but it advances the RNG),
      and — on PRD-cadence steps (global_step % 10 == 1,
      run_nerf.py:505-516) — the partner image. We replay the identical
      draw sequence.
    - **The once-per-pair PRD quirk.** The reference's match cache puts the
      whole PRD computation under the cache-miss branch
      (run_nerf.py:517-601: the ``if result[0] is not None`` at :532 is
      indented inside the ``else:`` at :519), so the PRD loss joins the
      objective only the FIRST time each image pair is encountered; cached
      pairs train photometric-only. Replicated as-is — the harness pins the
      reference's actual behavior, while our production driver applies PRD
      at every cadence step (documented divergence, like the camera-grad
      sync fix).

    Matches come from the reference's own SIFT pipeline (oracle import) so
    both sides see identical correspondences.
    """
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera
    from scnerf_tpu.matching.pairs import image_pair_candidates
    from scnerf_tpu.render.renderer import RenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    i_train = np.asarray(d.i_train)
    near = float(d.bds.min()) * 0.9
    far = float(d.bds.max())
    K_init = d.gt_intrinsic.copy()
    K_init[0, 0] = K_init[1, 1] = d.noisy_focal
    cam = init_camera(
        K_init, d.noisy_poses[i_train],
        CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                     ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                     extrinsics_noise_scale=1.0, intrinsics_noise_scale=1.0),
    )
    params = dict(init_params, camera=cam)
    render_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True,
    )
    train_cfg = TrainConfig(lr_init=LR, lr_decay_steps=LR_DECAY * 1000,
                            near=near, far=far, use_ndc=False,
                            prd_method="NeRF", prd_threshold=5.0)
    cur = Curriculum(add_prd=0, i_ray_dist_loss=10, ray_dist_loss_weight=1e-4)
    tx = make_optimizer(LR, LR_DECAY * 1000, params_example=params)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model_cfg, render_cfg, train_cfg, cur, tx,
                              with_prd=False, donate=False)
    step_prd_fn = make_train_step(model_cfg, render_cfg, train_cfg, cur, tx,
                                  with_prd=True, donate=False)

    # feasible pairs over the noisy train poses, global ids (as the ref)
    pairs = image_pair_candidates(d.noisy_poses[i_train], 30.0, i_map=i_train)
    local = {int(g): li for li, g in enumerate(i_train)}

    idx = np.arange(H * W)
    px_all = (idx % W).astype(np.float32)
    py_all = (idx // W).astype(np.float32)

    np.random.seed(777)  # fix_seeds(777): replay the reference's np stream
    seen_pairs = set()
    match_cache = {}
    losses, psnrs = [], []
    key = jax.random.key(0)
    for it in range(n_steps):
        gstep = it  # reference global_step during its iteration i = it + 1
        img_i = int(np.random.choice(i_train))
        np.random.choice(H * W, size=[H * W], replace=False)  # RNG-advance only
        ci = local[img_i]
        batch = {
            "px": jnp.asarray(px_all),
            "py": jnp.asarray(py_all),
            "img_idx": jnp.full((H * W,), ci, jnp.int32),
            "target": jnp.asarray(d.images[img_i].reshape(-1, 3)),
        }
        prd_batch = None
        if gstep % 10 == 1 and img_i in pairs and len(pairs[img_i]):
            img_j = int(np.random.choice(pairs[img_i]))
            cj = local[img_j]
            if (ci, cj) not in seen_pairs:  # the once-per-pair quirk
                seen_pairs.add((ci, cj))
                if (img_i, img_j) not in match_cache:
                    match_cache[(img_i, img_j)] = reference_sift_matches(
                        d.images[img_i], d.images[img_j]
                    )
                m = match_cache[(img_i, img_j)]
                if m is not None:
                    kps0, kps1 = m
                    prd_batch = dict(
                        batch,
                        kps0=jnp.asarray(kps0), kps1=jnp.asarray(kps1),
                        kp_mask=jnp.ones((kps0.shape[0],), bool),
                        pair_idx=jnp.asarray([ci, cj]),
                    )
        if prd_batch is not None:
            state, metrics = step_prd_fn(state, prd_batch, jax.random.fold_in(key, it))
        else:
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, it))
        losses.append(float(metrics["mse"]) + float(metrics["mse0"]))
        psnrs.append(float(metrics["psnr"]))
    if not seen_pairs:
        raise RuntimeError(
            "PRD parity run never applied the PRD loss — no feasible pair "
            "was drawn or SIFT found no matches; the run would be vacuous."
        )
    print(f"[ref_parity] PRD applied on {sorted(seen_pairs)} (once per "
          f"direction, the reference's cache quirk)")
    return np.asarray(losses), np.asarray(psnrs), state.params


def render_ours_from_ref(ref_final, scene_dir: str, model_cfg,
                         ndc: bool = False):
    """Re-render the reference's end-of-training trainset view (image 0,
    no-camera ray path, det sampling) from the REFERENCE's final weights
    through OUR renderer — per-pixel eval-path parity isolated from
    trajectory chaos."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import rays_no_camera
    from scnerf_tpu.data.llff import load_llff
    from scnerf_tpu.render.renderer import RenderConfig, render_chunked

    d = load_llff(scene_dir, factor=1, llffhold=8)
    if ndc:
        near, far = 0.0, 1.0
    else:
        near, far = float(d.bds.min()) * 0.9, float(d.bds.max())
    params = {"coarse": ref_final["coarse"], "fine": ref_final["fine"]}
    eval_cfg = RenderConfig(
        n_samples=SAMPLES["n_samples"], n_importance=SAMPLES["n_importance"],
        perturb=False, raw_noise_std=0.0, use_viewdirs=True,
    )
    idx = np.arange(H * W)
    px = jnp.asarray((idx % W).astype(np.float32))
    py = jnp.asarray((idx // W).astype(np.float32))
    # the reference's hardcoded i_train=[0] renders IMAGE 0 (run_nerf.py:910)
    rays_o, rays_d = rays_no_camera(
        H, W, d.noisy_focal, jnp.asarray(d.noisy_poses[0, :3, :4]), px, py)
    viewdirs = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
    if ndc:
        from scnerf_tpu.geometry.ndc import ndc_rays

        rays_o, rays_d = ndc_rays(H, W, d.noisy_focal, d.noisy_focal, 1.0,
                                  rays_o, rays_d)
    out = render_chunked(params, model_cfg, eval_cfg, rays_o, rays_d,
                         viewdirs, near, far, jax.random.key(0))
    # batchify_rays clamps rgb >= 1 (render.py:404-406)
    return np.minimum(np.asarray(out["rgb"]).reshape(H, W, 3), 1.0)


def tree_max_diff(a, b) -> float:
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    return max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) for x, y in zip(la, lb)
    )


def main(n_steps: int = 200, out_json: str | None = None, workdir: str | None = None,
         camera: bool = False, ndc: bool = False, prd: bool = False,
         blender: bool = False, custom_optim: bool = False,
         batching: bool = False, scratch: bool = False, noise: bool = False,
         render_check: bool = False, precrop: bool = False,
         fullnoise: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")  # f32-exact, leaves the TPU free

    global N_IMAGES, TEXTURE
    N_IMAGES, TEXTURE = 2, False  # reset: regimes mutate these module
    # globals, and in-process callers (the e2e suite) invoke main() for
    # several regimes sequentially.
    if prd:
        camera = True
        N_IMAGES, TEXTURE = 3, True  # 2 train images -> 1 feasible pair
    if custom_optim:
        camera = True  # the decayed params are the camera's noise grids
    if batching:
        camera = True  # the published combination (see _run_ours_batching)
        N_IMAGES = 3  # 2 train images -> per-batch image mixing
    if scratch:
        camera = True  # self-calibration from scratch needs the camera
    if noise:
        camera = True  # noisy-start self-calibration
    if precrop:
        camera = True  # per-image camera path with the early center crop
    if fullnoise:
        camera = True  # stochastic fern semantics, camera path
    workdir = workdir or tempfile.mkdtemp(prefix="ref_parity_")
    scene = os.path.join(workdir, "scene")
    (build_blender_scene if blender else build_scene)(scene)
    model_cfg, init_params = make_init_params()
    init_tar = os.path.join(workdir, "init.tar")
    write_init_ckpt(init_params, init_tar)

    print(f"[ref_parity] scene={scene} steps={n_steps} camera={camera} "
          f"ndc={ndc} prd={prd} blender={blender} custom_optim={custom_optim} "
          f"batching={batching} scratch={scratch} noise={noise}")
    ref_mse, ref_final = run_reference(scene, n_steps, init_tar, workdir,
                                       camera=camera, ndc=ndc, prd=prd,
                                       blender=blender, custom_optim=custom_optim,
                                       batching=batching, scratch=scratch,
                                       noise=noise, render_check=render_check,
                                       precrop=precrop, fullnoise=fullnoise)
    ref_loss = ref_mse.sum(1)
    ref_psnr = -10.0 * np.log10(ref_mse[:, 0])

    our_loss, our_psnr, our_final = run_ours(scene, n_steps, model_cfg,
                                             init_params, camera=camera, ndc=ndc,
                                             prd=prd, blender=blender,
                                             custom_optim=custom_optim,
                                             batching=batching, scratch=scratch,
                                             noise=noise, precrop=precrop,
                                             fullnoise=fullnoise)

    rel = np.abs(our_loss - ref_loss) / np.maximum(ref_loss, 1e-12)
    w_diff = {
        k: tree_max_diff(our_final[k], ref_final[k])
        for k in ("coarse", "fine") if ref_final.get(k) is not None
    }
    if "camera_fields" in ref_final:
        cam = our_final["camera"]
        w_diff["camera"] = max(
            float(np.abs(np.asarray(getattr(cam, f)) - np.asarray(v)).max())
            for f, v in ref_final["camera_fields"].items()
            if getattr(cam, f, None) is not None
        )
    render_diff = None
    if render_check and "render::train0" in ref_final:
        ours_rgb = render_ours_from_ref(ref_final, scene, model_cfg, ndc=ndc)
        render_diff = float(np.abs(ours_rgb - ref_final["render::train0"]).max())
        print(f"[ref_parity] render-path max |rgb diff|: {render_diff:.2e}")

    report = {
        "camera_model": bool(camera),
        "ndc": bool(ndc),
        "prd": bool(prd),
        "blender": bool(blender),
        "custom_optim": bool(custom_optim),
        "batching": bool(batching),
        "scratch": bool(scratch),
        "noise": bool(noise),
        "precrop": bool(precrop),
        "fullnoise": bool(fullnoise),
        "n_steps": n_steps,
        "shape": {"H": H, "W": W, "mlp": dict(MLP), "samples": dict(SAMPLES),
                  "n_rand": (N_RAND_PRECROP if precrop
                             else N_RAND_BATCHING if batching
                             else (N_RAND_FULLNOISE or H * W) if fullnoise
                             else H * W)},
        "loss_rel_diff": {
            "step0": float(rel[0]),
            "first10_max": float(rel[:10].max()),
            "first50_max": float(rel[: min(50, n_steps)].max()),
            "final": float(rel[-1]),
            "max": float(rel.max()),
        },
        "psnr_final": {"ref": float(ref_psnr[-1]), "ours": float(our_psnr[-1]),
                       "abs_diff_db": float(abs(ref_psnr[-1] - our_psnr[-1]))},
        "final_weight_max_abs_diff": w_diff,
        "ref_loss_head": ref_loss[:5].tolist(),
        "our_loss_head": our_loss[:5].tolist(),
        "ref_loss_tail": ref_loss[-3:].tolist(),
        "our_loss_tail": our_loss[-3:].tolist(),
    }
    if render_diff is not None:
        report["render_path_max_abs_rgb_diff"] = render_diff
    print(json.dumps(report, indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
        print(f"[ref_parity] wrote {out_json}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--camera", action="store_true",
                    help="learnable-camera (self-calibration) parity run")
    ap.add_argument("--ndc", action="store_true",
                    help="NDC-space run (the reference's LLFF default)")
    ap.add_argument("--prd", action="store_true",
                    help="flagship regime: camera + projected-ray-distance loss")
    ap.add_argument("--blender", action="store_true",
                    help="blender pipeline (white background, near/far 2/6)")
    ap.add_argument("--custom_optim", action="store_true",
                    help="demo.sh regime: CustomAdam with weight decay on "
                         "the camera noise grids")
    ap.add_argument("--batching", action="store_true",
                    help="use_batching + camera: the published LLFF "
                         "main-table sampling path (shuffled global pixel "
                         "pool, per-ray image indices)")
    ap.add_argument("--scratch", action="store_true",
                    help="main_table_1 from-scratch protocol: "
                         "run_without_colmap both + fx=W/fy=H camera seed")
    ap.add_argument("--noise", action="store_true",
                    help="injected-noise start: initial_noise_size_* with "
                         "the loader's RNG stream replayed")
    ap.add_argument("--render", action="store_true", dest="render_check",
                    help="also compare the end-of-training trainset render "
                         "per-pixel (no-camera regimes; the reference's "
                         "camera-branch render crashes upstream)")
    ap.add_argument("--precrop", action="store_true",
                    help="per-image path with the early center-crop phase "
                         "(precrop_iters = steps/2), RNG replayed")
    ap.add_argument("--fullnoise", action="store_true",
                    help="stochastic fern semantics: perturb=1 + "
                         "raw_noise_std=1 with the torch stream replayed")
    a = ap.parse_args()
    main(a.steps, a.out, a.workdir, camera=a.camera, ndc=a.ndc, prd=a.prd,
         blender=a.blender, custom_optim=a.custom_optim, batching=a.batching,
         scratch=a.scratch, noise=a.noise, render_check=a.render_check,
         precrop=a.precrop, fullnoise=a.fullnoise)
