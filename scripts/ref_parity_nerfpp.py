"""NeRF++ trajectory-parity harness: scnerf-tpu vs the ACTUAL torch
reference trainer (`/root/reference/nerfplusplus/ddp_train_nerf.py:311`).

Companion to scripts/ref_parity.py (which covers the NeRF pipeline in five
regimes); this one pins the NeRF++ pipeline end-to-end — cascade sampling,
fg/bg inverted-sphere fields, sort-merge importance resampling, OPENCV ray
generation, and (``--camera``) the learnable camera with the NeRF++ noise
scales — against the reference running its own training loop on torch-cpu
at world_size=1 (see scripts/_ref_driver_nerfpp.py).

Determinism here is by FULL RNG REPLAY, not by removing randomness (the
NeRF++ trainer has no ``perturb=0`` switch — ``perturb_samples`` and
``sample_pdf(det=False)`` always draw):

- numpy stream (seed 777, ``ddp_train_nerf.py:362-363``): per step, the
  image pick ``randint`` and the no-replacement pixel permutation. One
  train image + ``N_rand = H*W`` makes the batch a permutation of all
  pixels (mean MSE is permutation-invariant), but the draws still advance
  the stream and the permutation still routes each torch uniform to a
  specific pixel, so both are replayed.
- torch stream (seed 777, ``:364-365``): per step, exactly four f32 draws —
  perturb t_rand for fg and bg (level 0, ``perturb_samples`` :71-80), then
  the inverse-CDF u for fg and bg (level 1, ``sample_pdf`` :83-132). The
  harness draws the identical tensors with torch, scatters the rows from
  the reference's ray order back to pixel order via the replayed
  permutation, and injects them into our jitted step
  (``render_rays_nerfpp(rands=...)``).

The scene is written through OUR dataset-prep writer
(``tools/colmap.py:write_nerfpp_split``) and read by the REFERENCE's
``data_loader_split.py`` — a live format-compatibility check. Cameras sit
on a radius-0.7 circle looking at the origin (inside the unit sphere, as
``intersect_sphere`` requires, ``ddp_train_nerf.py:61-65``).

Usage:
  python scripts/ref_parity_nerfpp.py [--steps 150] [--camera]
      [--out PARITY_TRAJ_NERFPP.json]
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
N_TRAIN = 1
TEXTURE = False  # PRD regime: high-frequency texture so SIFT finds matches
DIST_K = None  # fisheye regime: shared (k1, k2) written as 18-float intrinsics
CASCADE = (8, 8)
MLP = dict(depth=8, width=64, max_freq_log2=10, max_freq_log2_viewdirs=4)
LR, LR_DECAY_STEPS = 5e-4, 750  # reference units: *1000 inside the trainer
# None -> N_rand = H*W (toy mode: every step is a permutation of all pixels,
# rands scattered back to pixel order). An int < H*W switches to feeding the
# reference's DRAWN pixels in the reference's ray order (the production
# N_rand=256 semantics, ``nerf_sample_ray_split.py:147``) — see
# scripts/ref_parity_fullshape_nerfpp.py.
N_RAND = None
REMAT_CHUNK = 0  # fullshape mode sets the production remat chunk (8)
REF_TIMEOUT = 3600
# Applied by main() AFTER its per-regime global resets; the fullshape
# wrapper uses this to pin shapes without editing regime logic.
SHAPE_OVERRIDE: dict = {}


def scene_image(i: int) -> np.ndarray:
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


def look_at_c2w(pos: np.ndarray) -> np.ndarray:
    """OPENCV-convention c2w: z forward (towards origin), y down."""
    z = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return c2w


def build_scene(datadir: str) -> str:
    """Write the NeRF++ split layout through OUR writer; the reference's
    loader reads it back (format round-trip)."""
    import imageio.v2 as imageio

    from scnerf_tpu.tools.colmap import write_nerfpp_split

    K = np.eye(4)
    K[0, 0] = K[1, 1] = FOCAL
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0

    img_dir = os.path.join(datadir, "_src_images")
    os.makedirs(img_dir, exist_ok=True)
    scene_dir = os.path.join(datadir, "scene")

    def cam_entry(i, n_total):
        # PRD mode needs feasible pairs: relative look-at rotations must stay
        # under the 30-degree pairing threshold, so pack the ring tightly.
        step = 0.15 if TEXTURE else 2 * np.pi / max(n_total, 3)
        ang = step * i
        pos = 0.7 * np.array([np.cos(ang), np.sin(ang), 0.25])
        return np.linalg.inv(look_at_c2w(pos))

    for split, ids in (("train", range(N_TRAIN)),
                       ("validation", range(N_TRAIN, N_TRAIN + 1))):
        cam_dict = {}
        for i in ids:
            name = f"im_{i:02d}.png"
            imageio.imwrite(os.path.join(img_dir, name), scene_image(i))
            cam_dict[name] = {
                "K": K.reshape(-1).tolist(),
                "W2C": cam_entry(i, N_TRAIN + 1).reshape(-1).tolist(),
                "img_size": [W, H],
            }
            if DIST_K is not None:
                cam_dict[name]["k"] = list(DIST_K)
        write_nerfpp_split(cam_dict, scene_dir, split=split,
                           image_src_dir=img_dir)
    return scene_dir


def _load_reference_oracle():
    """Import the reference's matching modules as oracles (no code copied;
    the checkout executes as-is) so both trainers consume bit-identical
    correspondences and feasible-pair tables."""
    import importlib.util
    import types

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
        repro = load("/root/reference/model/reprojection.py", "_refpp_reprojection")
        rdl = load("/root/reference/model/ray_dist_loss.py", "_refpp_ray_dist_loss")
    finally:
        sys.path.pop(0)
        sys.path.pop(0)
    return repro, rdl


def reference_sift_raw(img0_f32: np.ndarray, img1_f32: np.ndarray):
    """Raw SIFT match result via the reference's own pipeline
    (``model/reprojection.py:runSIFTSinglePair``) on the [0,1] float images
    the NeRF++ trainer holds (``ddp_train_nerf.py:309``, get_images).
    Returns numpy {kps0, kps1, matches} for the driver's matcher stub."""
    import cv2 as cv
    import torch

    repro, _ = _load_reference_oracle()
    result = repro.runSIFTSinglePair(
        cv.SIFT_create(), torch.from_numpy(img0_f32), torch.from_numpy(img1_f32),
        "cpu", None,
    )[0]
    return {k: result[k].numpy() for k in ("kps0", "kps1", "matches")}


def reference_feasible_pairs(extrinsics: np.ndarray, threshold: float = 30.0):
    """Feasible image pairs via the reference's own
    ``image_pair_candidates`` (``model/reprojection.py:16-52``) so the
    replayed ``np.random.choice(pairs[img_i])`` sees identical arrays."""
    repro, _ = _load_reference_oracle()

    class _Args:
        pairing_angle_threshold = threshold

    return {k: list(v) for k, v in
            repro.image_pair_candidates(extrinsics, _Args()).items()}


def make_init_params(autoexpo: bool = False):
    import jax

    from scnerf_tpu.fields.nerfpp import NerfPPConfig, init_nerfpp_net

    cfg = NerfPPConfig(**MLP)
    key = jax.random.key(4321)
    levels = [init_nerfpp_net(jax.random.fold_in(key, m), cfg,
                              n_images=N_TRAIN, autoexpo=autoexpo)
              for m in range(len(CASCADE))]
    return cfg, levels


def train_img_paths(datadir: str) -> list:
    """The trainer's ray_sampler img_paths (loader order = sorted rgb
    files), needed for name-keyed autoexpo state-dict entries."""
    rgb = os.path.join(datadir, "scene", "train", "rgb")
    return [os.path.join(rgb, f) for f in sorted(os.listdir(rgb))]


def write_init_ckpt(levels, expdir: str, img_paths: list | None = None) -> None:
    import torch

    from scnerf_tpu.tools.convert import params_to_torch_nerfnet

    os.makedirs(expdir, exist_ok=True)
    ckpt = {"optim": {"state": {}}}
    for m, lvl in enumerate(levels):
        ckpt[f"net_{m}"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_torch_nerfnet(lvl, img_paths=img_paths).items()
        }
    torch.save(ckpt, os.path.join(expdir, "model_000000.pth"))


def _free_port() -> int:
    """A currently-free TCP port for the gloo rendezvous (world_size=1), so
    concurrent harness invocations don't collide on the default."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def precompute_matches(datadir: str, workdir: str, pairs: dict) -> tuple:
    """Run the reference's SIFT on the on-disk images (exactly as the
    trainer will see them: imageio read / 255) for every ordered feasible
    pair; save raw results for the driver's matcher stub and return them."""
    import imageio.v2 as imageio

    rgb_dir = os.path.join(datadir, "scene", "train", "rgb")
    files = sorted(os.listdir(rgb_dir))
    images = [np.asarray(imageio.imread(os.path.join(rgb_dir, f)))
              .astype(np.float32) / 255.0 for f in files]
    raw = {}
    for i, js in pairs.items():
        for j in js:
            if (i, j) not in raw:
                r = reference_sift_raw(images[i], images[j])
                # Round keypoints to integer pixels: the NeRF++ trainer's
                # flat-index ray lookup floors the SUM y*W + x
                # (ddp_train_nerf.py:524-526), which only decodes to the
                # intended pixel when kps are integer-valued — true for the
                # SuperGlue/SuperPoint matches it always uses (heatmap-grid
                # detections), not for subpixel SIFT. Integer kps keep the
                # harness inside the reference's real operating regime.
                clip = lambda a: np.clip(np.round(a), 0, [W - 1, H - 1])
                r = dict(r, kps0=clip(r["kps0"]), kps1=clip(r["kps1"]))
                raw[(i, j)] = r
    out = {}
    for (i, j), r in raw.items():
        for k, v in r.items():
            out[f"{i}_{j}::{k}"] = v
    path = os.path.join(workdir, "sift_matches.npz")
    np.savez(path, **out)
    return path, raw


def run_reference(datadir: str, n_steps: int, workdir: str, camera: bool,
                  matches_npz: str | None = None, autoexpo: bool = False,
                  fisheye: bool = False, render_check: bool = False):
    out_npz = os.path.join(workdir, "ref_out.npz")
    flags = [
        "--expname", "parity", "--basedir", workdir,
        "--datadir", datadir, "--scene", "scene", "--testskip", "1",
        "--netdepth", str(MLP["depth"]), "--netwidth", str(MLP["width"]),
        "--max_freq_log2", str(MLP["max_freq_log2"]),
        "--max_freq_log2_viewdirs", str(MLP["max_freq_log2_viewdirs"]),
        "--use_viewdirs",
        "--N_rand", str(N_RAND or H * W), "--N_iters", str(n_steps),
        "--cascade_level", str(len(CASCADE)),
        "--cascade_samples", ",".join(str(c) for c in CASCADE),
        "--lrate", str(LR), "--lrate_decay_factor", "0.1",
        "--lrate_decay_steps", str(LR_DECAY_STEPS),
        "--chunk_size", "32768",
        "--i_print", "1000000",
        "--i_img", str(n_steps if render_check else 1000000),
        "--i_weights", str(n_steps), "--camera_log", "1000000",
        "--master_addr", str(_free_port()), "--normalize_factor", "1.0",
    ]
    if autoexpo:
        # reference default lambda (config_argparser.py:48) made explicit.
        flags += ["--optim_autoexpo", "--lambda_autoexpo", "1.0"]
    if camera:
        # NeRF++-pipeline defaults (config_argparser.py:68-80): ray noise
        # 1e-3, extrinsics 1e-2, intrinsics 1.0. add_ie/add_od=0 with
        # start=0 skips create_nerf's deactivation (start < add_* is
        # false), so all noise groups train from the first step; add_prd
        # stays -1 (SuperGlue weights are not in this image).
        model = "fisheye" if fisheye else "pinhole_rot_noise_10k_rayo_rayd"
        flags += ["--use_camera", "--camera_model", model,
                  "--add_ie", "0", "--add_od", "0", "--grid_size", "10"]
    if fisheye:
        # Published fisheye configs: camera_model=fisheye (-> the Distortion
        # variant, create_nerf.py:31-34), run_fisheye (no PRD, val=train),
        # multiplicative intrinsics noise, add_radial active from step 0.
        flags += ["--run_fisheye", "--add_radial", "0",
                  "--multiplicative_noise"]
    if matches_npz:
        # PRD active every step (alternate_frequency=1, gs > add_prd=0,
        # ddp_train_nerf.py:494-497); matches come from the driver's
        # matcher stub reading this npz.
        flags += ["--add_prd", "0", "--alternate_frequency", "1",
                  "--ray_dist_loss_weight", "0.0001",
                  "--pairing_angle_threshold", "30"]
    spec = {"flags": flags, "n_steps": n_steps, "out_npz": out_npz,
            "workdir": workdir, "matches_npz": matches_npz,
            "record_renders": bool(render_check),
            "scene_rgb_dir": os.path.join(datadir, "scene", "train", "rgb")}
    spec_path = os.path.join(workdir, "ref_spec.json")
    json.dump(spec, open(spec_path, "w"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ref_driver_nerfpp.py"),
         spec_path],
        capture_output=True, text=True, timeout=REF_TIMEOUT,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError(f"reference NeRF++ trainer failed rc={r.returncode}")
    data = np.load(out_npz)
    mse = data["mse"].reshape(n_steps, len(CASCADE))

    from scnerf_tpu.tools.convert import torch_nerfnet_to_params

    final = {}
    for m in range(len(CASCADE)):
        sd = {k[len(f"net{m}::"):]: data[k] for k in data.files
              if k.startswith(f"net{m}::")}
        if sd:
            final[f"level{m}"] = torch_nerfnet_to_params(sd, depth=MLP["depth"])
            ae = {k.split("autoexpo_params.")[1]: np.asarray(v)
                  for k, v in sd.items() if "autoexpo_params." in k}
            if ae:
                # name-keyed -> index order (sorted names == loader order)
                final[f"autoexpo{m}"] = np.stack(
                    [ae[k] for k in sorted(ae)], 0)
    cam_sd = {k[5:]: data[k] for k in data.files if k.startswith("cam::")}
    if cam_sd:
        from scnerf_tpu.tools.convert import torch_camera_to_fields

        final["camera_fields"] = torch_camera_to_fields(cam_sd)
    for tag in ("render::val", "render::train"):
        if tag in data.files:
            final[tag] = data[tag]
    return mse, final


def replay_rngs(n_steps: int, pairs: dict | None = None):
    """Replay the reference's per-step numpy + torch draws
    (``ddp_train_nerf.py:362-365`` seeds; loop order per step: np randint,
    np no-replacement pixel choice (``nerf_sample_ray_split.py:147``,
    drawn once at cascade level 0 and reused), torch rand x4, then — PRD
    runs only — the np partner pick
    ``np.random.choice(feasible_image_pairs[img_i])``,
    ``ddp_train_nerf.py:498``).

    Toy mode (``N_RAND is None``): N_rand = H*W, every step permutes all
    pixels; rands are scattered back to pixel order so ``run_ours`` can
    feed the fixed full-image pixel grid. Fullshape mode (``N_RAND`` set):
    the drawn pixels are fed in the REFERENCE'S ray order and rands stay
    in draw order; ``run_ours`` gathers px/py/target by ``perm``."""
    import torch

    np.random.seed(777)
    torch.manual_seed(777)
    n = H * W
    n_rand = N_RAND or n
    out = []
    for _ in range(n_steps):
        img_i = int(np.random.randint(0, N_TRAIN))
        perm = np.random.choice(n, size=(n_rand,), replace=False)
        t_fg = torch.rand(n_rand, CASCADE[0]).numpy()
        t_bg = torch.rand(n_rand, CASCADE[0]).numpy()
        u_fg = torch.rand(n_rand, CASCADE[1]).numpy()
        u_bg = torch.rand(n_rand, CASCADE[1]).numpy()

        if N_RAND is None:
            def reorder(a):
                b = np.empty_like(a)
                b[perm] = a  # reference ray p is pixel perm[p]
                return b
        else:
            def reorder(a):
                return a  # reference ray order, as drawn

        img_j = None
        if pairs is not None:
            img_j = int(np.random.choice(pairs[img_i]))
        out.append((img_i, img_j, perm, (
            (reorder(t_fg), reorder(t_bg)),
            (reorder(u_fg), reorder(u_bg)),
        )))
    return out


def run_ours(datadir: str, n_steps: int, model_cfg, init_levels, camera: bool,
             prd_matches: dict | None = None, pairs: dict | None = None,
             autoexpo: bool = False, fisheye: bool = False):
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import rays_opencv
    from scnerf_tpu.data.nerfpp_split import load_nerfpp_split
    from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import create_train_state

    d = load_nerfpp_split(os.path.join(datadir, "scene"), "train")
    n = H * W
    idx = np.arange(n)
    px = (idx % W).astype(np.float32)
    py = (idx // W).astype(np.float32)

    params = {"levels": [dict(l) for l in init_levels]}
    if camera:
        from scnerf_tpu.camera.model import CameraConfig, OPENCV, init_camera

        cam_cfg = CameraConfig(
            H=H, W=W, grid_size=10, convention=OPENCV, pixel_offset=0.5,
            # NeRF++-pipeline defaults (config_argparser.py:68-80).
            ray_o_noise_scale=1e-3, ray_d_noise_scale=1e-3,
            extrinsics_noise_scale=1e-2, intrinsics_noise_scale=1.0,
            # fisheye: the Distortion variant with the reference's
            # shared-storage ray-noise quirk and multiplicative K noise.
            use_distortion=fisheye, tied_ray_noise=fisheye,
            multiplicative_noise=fisheye, distortion_noise_scale=1e-2,
        )
        k = d.k[0] if (fisheye and d.k is not None) else None
        params["camera"] = init_camera(d.intrinsics[0], d.poses, cam_cfg, k=k)

    render_cfg = NerfPPRenderConfig(cascade_samples=CASCADE, perturb=True,
                                    remat_chunk=REMAT_CHUNK)
    train_cfg = NerfPPTrainConfig(lr_init=LR,
                                  lr_decay_steps=LR_DECAY_STEPS * 1000,
                                  autoexpo=autoexpo, lambda_autoexpo=1.0)
    cur = Curriculum(add_prd=0, i_ray_dist_loss=1, ray_dist_loss_weight=1e-4)
    tx = make_optimizer(LR, LR_DECAY_STEPS * 1000, params_example=params)
    state = create_train_state(params, tx)
    step_fn = make_nerfpp_train_step(model_cfg, render_cfg, train_cfg,
                                     cur, tx, with_prd=False, donate=False)
    step_prd_fn = None
    kps_by_pair = {}
    if prd_matches is not None:
        step_prd_fn = make_nerfpp_train_step(model_cfg, render_cfg, train_cfg,
                                             cur, tx, with_prd=True,
                                             donate=False)
        # Preprocess with the reference's own aligner and pad every pair to
        # one fixed match count (single jit compile; mask handles the pad).
        import torch

        _, rdl = _load_reference_oracle()
        raw_t = {
            k: [{kk: torch.from_numpy(vv) for kk, vv in r.items()}]
            for k, r in prd_matches.items()
        }
        pre = {k: rdl.preprocess_match(v) for k, v in raw_t.items()}
        m_max = max(p.shape[1] for p in pre.values())
        for k, p in pre.items():
            m = p.shape[1]
            kp = np.zeros((2, m_max, 2), np.float32)
            kp[:, :m] = p.numpy().astype(np.float32)
            mask = np.zeros((m_max,), bool)
            mask[:m] = True
            kps_by_pair[k] = (kp[0], kp[1], mask)

    rngs = replay_rngs(n_steps, pairs=pairs)
    base = {
        "px": jnp.asarray(px),
        "py": jnp.asarray(py),
        "min_depth": jnp.full((n,), 1e-4, jnp.float32),
    }
    losses, psnrs = [], []
    n_prd_steps = 0
    key = jax.random.key(0)
    for it in range(n_steps):
        img_i, img_j, perm, rands = rngs[it]
        if N_RAND is None:
            batch = dict(
                base,
                target=jnp.asarray(d.images[img_i].reshape(-1, 3)),
                rands=jax.tree.map(jnp.asarray, rands),
            )
            px_s, py_s = px, py
            n_rays = n
        else:
            # fullshape mode: the reference's drawn pixels, in its ray order.
            px_s = (perm % W).astype(np.float32)
            py_s = (perm // W).astype(np.float32)
            batch = {
                "px": jnp.asarray(px_s), "py": jnp.asarray(py_s),
                "min_depth": jnp.full((len(perm),), 1e-4, jnp.float32),
                "target": jnp.asarray(d.images[img_i].reshape(-1, 3)[perm]),
                "rands": jax.tree.map(jnp.asarray, rands),
            }
            n_rays = len(perm)
        batch["img_idx"] = jnp.full((n_rays,), img_i, jnp.int32)
        if not camera:
            ro, rd = rays_opencv(jnp.asarray(d.intrinsics[img_i]),
                                 jnp.asarray(d.poses[img_i]), px_s, py_s)
            batch.update(rays_o=ro, rays_d=rd)
            batch.pop("px"), batch.pop("py")
        fn = step_fn
        if step_prd_fn is not None and img_j is not None:
            kps0, kps1, mask = kps_by_pair[(img_i, img_j)]
            batch.update(
                kps0=jnp.asarray(kps0), kps1=jnp.asarray(kps1),
                kp_mask=jnp.asarray(mask),
                pair_idx=jnp.asarray([img_i, img_j]),
            )
            fn = step_prd_fn
        state, metrics = fn(state, batch, jax.random.fold_in(key, it))
        if "prd_matches" in metrics and int(metrics["prd_matches"]) > 0:
            n_prd_steps += 1
        losses.append(sum(float(metrics[f"mse_{m}"])
                          for m in range(len(CASCADE))))
        psnrs.append(float(metrics["psnr"]))
    if step_prd_fn is not None:
        if n_prd_steps == 0:
            raise RuntimeError("PRD parity run never applied the PRD loss — "
                               "the run would be vacuous.")
        print(f"[ref_parity_nerfpp] PRD contributed on {n_prd_steps}/"
              f"{n_steps} steps")
    return np.asarray(losses), np.asarray(psnrs), state.params


def write_export_ckpt(our_final, expdir: str, step: int,
                      img_paths: list | None = None) -> str:
    """Export OUR trained NeRF++ state as a reference ``model_{step}.pth``
    (round-2 VERDICT item 5, the ours->reference direction): per-level
    ``net_{m}`` state dicts (incl. name-keyed autoexpo entries), the
    camera state dict (incl. the tied-ray-noise shared buffer), and the
    ``optim`` stub the reference's merge-on-load accepts
    (``create_nerf.py:109-113``)."""
    import torch

    from scnerf_tpu.tools.convert import (
        camera_fields_to_torch,
        params_to_torch_nerfnet,
    )

    os.makedirs(expdir, exist_ok=True)
    if img_paths is not None:
        # Autoexpo checkpoints need the trainer's image-path list next to
        # them: create_nerf reads expdir/train_images.json to rebuild the
        # name-keyed ParameterDict (create_nerf.py:46-50).
        json.dump(img_paths, open(os.path.join(expdir, "train_images.json"),
                                  "w"))
    ckpt = {"optim": {"state": {}}}
    for m, lvl in enumerate(our_final["levels"]):
        ckpt[f"net_{m}"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_torch_nerfnet(lvl, img_paths=img_paths).items()
        }
    if our_final.get("camera") is not None:
        ckpt["camera_model"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in camera_fields_to_torch(our_final["camera"]).items()
        }
    path = os.path.join(expdir, f"model_{step:06d}.pth")
    torch.save(ckpt, path)
    return path


def run_reference_render_from_export(datadir: str, workdir: str,
                                     expname: str, camera: bool,
                                     autoexpo: bool = False,
                                     fisheye: bool = False, idx: int = 0):
    """Have the ACTUAL reference load our exported checkpoint (its own
    ``create_nerf`` reload glob + ``--load_test`` camera restore,
    ``create_nerf.py:82-130``) and render train view ``idx`` exactly as
    ``ddp_test_nerf.py:163-165`` does. Returns (rgb (H, W, 3), start)."""
    out_npz = os.path.join(workdir, "export_render.npz")
    flags = [
        "--expname", expname, "--basedir", workdir,
        "--datadir", datadir, "--scene", "scene", "--testskip", "1",
        "--netdepth", str(MLP["depth"]), "--netwidth", str(MLP["width"]),
        "--max_freq_log2", str(MLP["max_freq_log2"]),
        "--max_freq_log2_viewdirs", str(MLP["max_freq_log2_viewdirs"]),
        "--use_viewdirs",
        "--cascade_level", str(len(CASCADE)),
        "--cascade_samples", ",".join(str(c) for c in CASCADE),
        "--chunk_size", "32768",
        "--master_addr", str(_free_port()), "--normalize_factor", "1.0",
    ]
    if autoexpo:
        flags += ["--optim_autoexpo", "--lambda_autoexpo", "1.0"]
    if camera:
        model = "fisheye" if fisheye else "pinhole_rot_noise_10k_rayo_rayd"
        flags += ["--use_camera", "--camera_model", model,
                  "--add_ie", "0", "--add_od", "0", "--grid_size", "10",
                  # restore ALL camera fields incl. extrinsics from the
                  # exported state dict (create_nerf.py:125-129).
                  "--load_test"]
    if fisheye:
        flags += ["--run_fisheye", "--add_radial", "0",
                  "--multiplicative_noise"]
    spec = {"flags": flags, "out_npz": out_npz, "workdir": workdir,
            "render_from_ckpt": {"split": "train", "idx": idx}}
    spec_path = os.path.join(workdir, "export_spec.json")
    json.dump(spec, open(spec_path, "w"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ref_driver_nerfpp.py"),
         spec_path],
        capture_output=True, text=True, timeout=REF_TIMEOUT,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError(f"reference export render failed rc={r.returncode}")
    data = np.load(out_npz)
    return data["rgb"], int(data["start"])


def render_ours_final(our_final, datadir: str, model_cfg,
                      fisheye: bool = False, idx: int = 0):
    """Render train view ``idx`` from OUR final params through OUR renderer
    (learned camera ``image_idx`` path — the equivalent of the reference's
    ``camera_idx=idx`` eval, ``nerf_sample_ray_split.py:103-113``)."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.rays import full_image_pixels, pixels_to_rays, rays_opencv
    from scnerf_tpu.data.nerfpp_split import load_nerfpp_split
    from scnerf_tpu.render.nerfpp_renderer import (
        NerfPPRenderConfig,
        render_chunked_nerfpp,
    )

    d_tr = load_nerfpp_split(os.path.join(datadir, "scene"), "train")
    px, py = full_image_pixels(H, W)
    cam = our_final.get("camera")
    if cam is not None:
        ro, rd = pixels_to_rays(cam, px, py, image_idx=idx)
    else:
        ro, rd = rays_opencv(jnp.asarray(d_tr.intrinsics[idx]),
                             jnp.asarray(d_tr.poses[idx]), px, py)
    rcfg = NerfPPRenderConfig(cascade_samples=CASCADE, perturb=False,
                              remat_chunk=0)
    r = render_chunked_nerfpp(our_final["levels"], model_cfg, rcfg, ro, rd,
                              jnp.full((H * W,), 1e-4), jax.random.key(0))
    return np.asarray(r["rgb"]).reshape(H, W, 3)


def render_ours_from_ref(ref_final, datadir: str, model_cfg,
                         fisheye: bool = False):
    """Render the same two eval views the reference's i_img hook rendered,
    from the REFERENCE's final weights converted into our layout — isolates
    the full-image eval path (det cascade sampling, learned-K rays, chunked
    render) from trajectory chaos. Views: the validation image 0 with the
    learned K + noise grids over the DATASET pose (``get_all``'s
    camera_idx=None path), and train image 0 through the full learned
    camera (``camera_idx=idx`` path is NOT what the hook uses — it also
    passes camera_idx=None with the train sampler's pose)."""
    import jax
    import jax.numpy as jnp

    from scnerf_tpu.camera.model import CameraConfig, OPENCV, init_camera
    from scnerf_tpu.camera.rays import full_image_pixels, pixels_to_rays
    from scnerf_tpu.data.nerfpp_split import load_nerfpp_split
    from scnerf_tpu.render.nerfpp_renderer import (
        NerfPPRenderConfig,
        render_chunked_nerfpp,
    )

    d_tr = load_nerfpp_split(os.path.join(datadir, "scene"), "train")
    # run_fisheye loads train as the val split (ddp_train_nerf.py:335-338)
    d_val = d_tr if fisheye else load_nerfpp_split(
        os.path.join(datadir, "scene"), "validation")
    cam_cfg = CameraConfig(
        H=H, W=W, grid_size=10, convention=OPENCV, pixel_offset=0.5,
        ray_o_noise_scale=1e-3, ray_d_noise_scale=1e-3,
        extrinsics_noise_scale=1e-2, intrinsics_noise_scale=1.0,
        use_distortion=fisheye, tied_ray_noise=fisheye,
        multiplicative_noise=fisheye, distortion_noise_scale=1e-2,
    )
    k = d_tr.k[0] if (fisheye and d_tr.k is not None) else None
    cam = init_camera(d_tr.intrinsics[0], d_tr.poses, cam_cfg, k=k)
    cam = cam.replace(**ref_final["camera_fields"])
    levels = [ref_final[f"level{m}"] for m in range(len(CASCADE))]
    rcfg = NerfPPRenderConfig(cascade_samples=CASCADE, perturb=False,
                              remat_chunk=0)
    px, py = full_image_pixels(H, W)
    key = jax.random.key(0)  # unused: det sampling
    out = {}
    # The i_img hook fires at step 1 and step N; its what_*_to_log
    # round-robin counters are at 1 by the FINAL firing, so the recorded
    # renders are view 1 % len(split) (ddp_train_nerf.py:582,592).
    vi = 1 % d_val.poses.shape[0]
    ti = 1 % d_tr.poses.shape[0]
    for tag, pose in (("render::val", d_val.poses[vi]),
                      ("render::train", d_tr.poses[ti])):
        ro, rd = pixels_to_rays(cam, px, py, c2w=jnp.asarray(pose))
        r = render_chunked_nerfpp(levels, model_cfg, rcfg, ro, rd,
                                  jnp.full((H * W,), 1e-4), key)
        out[tag] = np.asarray(r["rgb"]).reshape(H, W, 3)
    return out


def tree_max_diff(a, b) -> float:
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    return max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) for x, y in zip(la, lb)
    )


def main(n_steps: int = 150, out_json: str | None = None,
         workdir: str | None = None, camera: bool = False, prd: bool = False,
         autoexpo: bool = False, fisheye: bool = False,
         render_check: bool = False, export_roundtrip: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")  # f32-exact, leaves the TPU free

    global N_TRAIN, TEXTURE, H, W, FOCAL, DIST_K
    # reset: regimes mutate these module globals and in-process callers
    # invoke main() for several regimes sequentially.
    N_TRAIN, TEXTURE, DIST_K = 1, False, None
    H, W, FOCAL = 24, 32, 28.0
    if prd:
        camera = True
        N_TRAIN, TEXTURE = 3, True  # tight ring -> every pair feasible
        H, W, FOCAL = 64, 96, 56.0  # SIFT needs resolution (4-10 matches/pair)
    if autoexpo:
        N_TRAIN = 2  # exercise per-image (scale, shift) keying
    if fisheye:
        camera = True
        N_TRAIN = 2  # distortion shared across views, per-view extrinsics
        DIST_K = (-0.12, 0.04)  # mild barrel: keeps warped pixels in-frame
    for _k, _v in SHAPE_OVERRIDE.items():
        globals()[_k] = _v
    workdir = workdir or tempfile.mkdtemp(prefix="ref_parity_nerfpp_")
    datadir = os.path.join(workdir, "data")
    build_scene(datadir)
    model_cfg, init_levels = make_init_params(autoexpo=autoexpo)
    write_init_ckpt(init_levels, os.path.join(workdir, "parity"),
                    img_paths=train_img_paths(datadir) if autoexpo else None)

    matches_npz, raw_matches, pairs = None, None, None
    if prd:
        from scnerf_tpu.data.nerfpp_split import load_nerfpp_split

        d = load_nerfpp_split(os.path.join(datadir, "scene"), "train")
        pairs = reference_feasible_pairs(d.poses.astype(np.float64))
        if not pairs or any(i not in pairs for i in range(N_TRAIN)):
            raise RuntimeError(f"not all images pair: {pairs}")
        matches_npz, raw_matches = precompute_matches(datadir, workdir, pairs)

    print(f"[ref_parity_nerfpp] workdir={workdir} steps={n_steps} "
          f"camera={camera} prd={prd} autoexpo={autoexpo} fisheye={fisheye} "
          f"render_check={render_check}")
    ref_mse, ref_final = run_reference(datadir, n_steps, workdir, camera,
                                       matches_npz=matches_npz,
                                       autoexpo=autoexpo, fisheye=fisheye,
                                       render_check=render_check)
    ref_loss = ref_mse.sum(1)
    ref_psnr = -10.0 * np.log10(ref_mse[:, -1])

    our_loss, our_psnr, our_final = run_ours(datadir, n_steps, model_cfg,
                                             init_levels, camera,
                                             prd_matches=raw_matches,
                                             pairs=pairs, autoexpo=autoexpo,
                                             fisheye=fisheye)

    rel = np.abs(our_loss - ref_loss) / np.maximum(ref_loss, 1e-12)
    w_diff = {}
    for m in range(len(CASCADE)):
        if f"level{m}" not in ref_final:
            continue
        ours_m = {k: v for k, v in our_final["levels"][m].items()
                  if k != "autoexpo"}
        w_diff[f"level{m}"] = tree_max_diff(ours_m, ref_final[f"level{m}"])
        if f"autoexpo{m}" in ref_final:
            w_diff[f"autoexpo{m}"] = float(np.abs(
                np.asarray(our_final["levels"][m]["autoexpo"])
                - ref_final[f"autoexpo{m}"]).max())
    if "camera_fields" in ref_final:
        cam = our_final["camera"]
        diffs = []
        for f, v in ref_final["camera_fields"].items():
            if getattr(cam, f, None) is None:
                continue
            if fisheye and f == "ray_d_grid":
                continue  # zeroed alias of the tied buffer (see convert.py)
            ours_v = np.asarray(getattr(cam, f))
            if fisheye and f == "ray_o_grid":
                # tied-ray-noise emulation: the torch shared buffer equals
                # the SUM of our two leaves (see CameraConfig.tied_ray_noise)
                ours_v = np.asarray(cam.ray_o_grid) + np.asarray(cam.ray_d_grid)
            diffs.append(float(np.abs(ours_v - np.asarray(v)).max()))
        w_diff["camera"] = max(diffs)
    render_diff = None
    if render_check and camera and "render::train" in ref_final:
        ours_r = render_ours_from_ref(ref_final, datadir, model_cfg,
                                      fisheye=fisheye)
        render_diff = {
            tag.split("::")[1]: float(
                np.abs(ours_r[tag] - ref_final[tag]).max())
            for tag in ("render::val", "render::train")
        }
        print(f"[ref_parity_nerfpp] render-path max |rgb diff|: {render_diff}")

    export = None
    if export_roundtrip:
        # Reverse direction (VERDICT item 5): export OUR trained state as a
        # reference .pth, have the REAL reference load + render it, and
        # compare per-pixel against our own render of the same view.
        write_export_ckpt(
            our_final, os.path.join(workdir, "export_parity"), n_steps,
            img_paths=train_img_paths(datadir) if autoexpo else None)
        ref_rgb, start = run_reference_render_from_export(
            datadir, workdir, "export_parity", camera,
            autoexpo=autoexpo, fisheye=fisheye, idx=0)
        ours_rgb = render_ours_final(our_final, datadir, model_cfg,
                                     fisheye=fisheye, idx=0)
        export = {"ref_loaded_step": start,
                  "max_abs_rgb_diff": float(np.abs(ours_rgb - ref_rgb).max())}
        print(f"[ref_parity_nerfpp] export-roundtrip: {export}")

    report = {
        "pipeline": "nerfpp",
        "camera_model": bool(camera),
        "prd": bool(prd),
        "autoexpo": bool(autoexpo),
        "fisheye": bool(fisheye),
        "n_steps": n_steps,
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
    if export is not None:
        report["export_roundtrip"] = export
    print(json.dumps(report, indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
        print(f"[ref_parity_nerfpp] wrote {out_json}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--camera", action="store_true",
                    help="learnable-camera (self-calibration) parity run")
    ap.add_argument("--prd", action="store_true",
                    help="flagship regime: camera + every-step NeRF++ PRD")
    ap.add_argument("--autoexpo", action="store_true",
                    help="per-image auto-exposure (scale, shift) regime")
    ap.add_argument("--fisheye", action="store_true",
                    help="FishEyeNeRF regime: Distortion camera variant "
                         "(radial warp, tied ray noise, multiplicative K)")
    ap.add_argument("--render", action="store_true", dest="render_check",
                    help="also compare full-image EVAL renders per-pixel: "
                         "the reference's det render_single_image vs our "
                         "renderer, both from the reference's final weights")
    ap.add_argument("--export_roundtrip", action="store_true",
                    help="after training, export OUR final state as a "
                         "reference model_*.pth, have the reference load "
                         "and render it (ddp_test_nerf protocol), and "
                         "compare per-pixel against our render")
    a = ap.parse_args()
    main(a.steps, a.out, a.workdir, camera=a.camera, prd=a.prd,
         autoexpo=a.autoexpo, fisheye=a.fisheye, render_check=a.render_check,
         export_roundtrip=a.export_roundtrip)
