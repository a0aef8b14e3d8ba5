"""Long-run production soak of the NeRF driver on the real TPU chip.

Exercises the PUBLISHED default path end-to-end — batching ON with the
camera model (the shuffled pixel-index pool, per-ray image indices through
the learnable camera), PRD cadence with SIFT matches, curriculum,
checkpointing — on a synthetic blender scene, and reports sustained +
marginal throughput and finiteness. Complements scripts/soak_nerfpp.py
(the NeRF++ twin) and the CPU trajectory-parity harness.

Usage: python scripts/soak_nerf.py [--steps 10000] [--out SOAK_NERF.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_scene(root: str, n_train: int = 8, H: int = 120, W: int = 160):
    import imageio.v2 as imageio

    from scnerf_tpu.data.blender import pose_spherical

    rng = np.random.RandomState(99)
    base = rng.rand(H, W * 2, 3)  # translated texture per view
    for split, n in (("train", n_train), ("val", 2), ("test", 2)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i in range(n):
            pose = np.array(pose_spherical(i * 360.0 / max(n, 3), -30.0, 4.0))
            img = np.zeros((H, W, 4))
            img[..., :3] = base[:, 2 * i : 2 * i + W]
            img[..., 3] = 1.0
            u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(root, split, f"r_{i}.png"), u8)
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)


def main(n_steps: int, out_json: str | None, workdir: str | None,
         small: bool = False):
    workdir = workdir or tempfile.mkdtemp(prefix="soak_nerf_")
    scene = os.path.join(workdir, "scene")
    build_scene(scene, H=40 if small else 120, W=56 if small else 160)

    from scnerf_tpu.core.config import experiment_from_flags
    from scnerf_tpu.train.driver import build_experiment, sample_batch, train_loop

    cfg = experiment_from_flags({
        "dataset_type": "blender", "datadir": scene,
        "N_rand": 128 if small else 1024,
        "N_samples": 8 if small else 64,
        "N_importance": 8 if small else 64,
        **({"netdepth": 2, "netwidth": 32, "multires": 4,
            "multires_views": 2} if small else {}),
        "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
        "ray_loss_type": "proj_ray_dist", "matcher": "sift",
        "i_ray_dist_loss": 10, "add_ie": 0, "add_od": 1000, "add_prd": 2000,
        "i_print": 1000, "i_img": 10 ** 9, "i_testset": 10 ** 9,
        "i_video": 10 ** 9, "i_weights": max(n_steps // 2, 1),
        "expname": "soak", "basedir": workdir,
    }, warn=lambda *a: None)
    expdir = os.path.join(workdir, "soak")
    os.makedirs(expdir, exist_ok=True)

    t0 = time.perf_counter()
    exp = build_experiment(cfg, expdir)
    assert exp.pixel_pool is not None, "expected the batching+camera pool"
    state, metrics = train_loop(exp, n_steps,
                                ckpt_dir=os.path.join(expdir, "ckpts"))
    total_dt = time.perf_counter() - t0

    import jax

    exp.state = state
    t1 = time.perf_counter()
    extra = 500
    key = jax.random.key(123)
    for it in range(extra):
        b = sample_batch(exp, n_steps + it)
        exp.state, m = exp.step_fn(exp.state, b, jax.random.fold_in(key, it))
    jax.block_until_ready(exp.state.params)
    marginal_dt = time.perf_counter() - t1
    final_metrics = {k: float(v) for k, v in m.items() if np.ndim(v) == 0}

    from scnerf_tpu.train.driver import evaluate_test_views

    ev = evaluate_test_views(exp, max_views=1)
    report = {
        "n_steps": n_steps + extra,
        "n_rand": cfg.sampling.N_rand,
        "sampling_path": "pixel_pool (batching+camera, the published default)",
        "train_rays_per_sec_incl_compile": round(
            n_steps * cfg.sampling.N_rand / total_dt, 1),
        "train_rays_per_sec_marginal": round(
            extra * cfg.sampling.N_rand / marginal_dt, 1),
        "final_metrics": final_metrics,
        "finite": bool(all(np.isfinite(v) for v in final_metrics.values())),
        "heldout_eval": {k: float(v) for k, v in ev.items()
                         if isinstance(v, (int, float, np.floating))},
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke of the soak mechanics)")
    a = ap.parse_args()
    main(a.steps, a.out, a.workdir, small=a.small)
