"""Long-run production soak of the NeRF++ driver on the real TPU chip.

Exercises the full production path end-to-end — split-dir loader, learnable
camera (OPENCV + noise grids), cascade render, PRD cadence with SIFT
matches, curriculum, checkpointing, periodic held-out eval — on a synthetic
textured scene for N steps, and reports sustained + marginal throughput and
finiteness. Complements the CPU trajectory-parity harness
(scripts/ref_parity_nerfpp.py): that one proves we match the reference;
this one proves the production driver survives scale on TPU.

Usage: python scripts/soak_nerfpp.py [--steps 20000] [--out SOAK_NERFPP.json]
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
sys.path.insert(0, os.path.join(REPO, "scripts"))


def build_soak_scene(datadir: str, n_train: int = 6, H: int = 120,
                     W: int = 160, fisheye: bool = False) -> str:
    import ref_parity_nerfpp as rp

    rp.H, rp.W, rp.FOCAL = H, W, 0.9 * W
    rp.N_TRAIN, rp.TEXTURE = n_train, True
    if fisheye:
        rp.DIST_K = (-0.12, 0.04)  # 18-float intrinsics (k1, k2)
    return rp.build_scene(datadir)


def main(n_steps: int, out_json: str | None, workdir: str | None,
         fisheye: bool = False):
    workdir = workdir or tempfile.mkdtemp(prefix="soak_nerfpp_")
    datadir = os.path.join(workdir, "data")
    scene = build_soak_scene(datadir, fisheye=fisheye)

    from scnerf_tpu.core.config import ExperimentConfig
    from scnerf_tpu.train.nerfpp_driver import (
        build_nerfpp_experiment,
        evaluate_nerfpp,
        nerfpp_sample_batch,
        run_nerfpp_training,
    )

    cfg = ExperimentConfig()
    cfg.dataset.dataset_type = "nerfpp"
    cfg.dataset.datadir = scene
    cfg.sampling.N_rand = 2048
    cfg.sampling.device_sampling = True
    cfg.model.cascade_samples = (64, 64)
    cfg.camera.camera_model = "pinhole_rot_noise_10k_rayo_rayd"
    cfg.camera.matcher = "sift"
    cfg.camera.ray_loss_type = "proj_ray_dist"
    cfg.camera.add_ie = 0
    cfg.camera.add_od = 1000
    cfg.camera.add_prd = 2000
    cfg.camera.i_ray_dist_loss = 10
    if fisheye:
        # Published fisheye run shape: Distortion camera (tied ray noise),
        # multiplicative K, radial curriculum, PRD off (run_fisheye).
        cfg.camera.camera_model = "fisheye"
        cfg.camera.run_fisheye = True
        cfg.camera.multiplicative_noise = True
        cfg.camera.ray_loss_type = "none"
        cfg.camera.add_radial = 500
    cfg.optim.lrate_decay_steps = 750_000
    cfg.logging.expname = "soak"
    cfg.logging.basedir = workdir
    cfg.logging.i_print = 1000
    cfg.logging.i_weights = max(n_steps // 2, 1)
    cfg.logging.i_img = 10 ** 9
    cfg.logging.i_testset = 10 ** 9  # eval run manually at the end

    expdir = os.path.join(workdir, "soak")
    os.makedirs(expdir, exist_ok=True)

    t0 = time.perf_counter()
    exp = build_nerfpp_experiment(cfg, expdir)
    run_nerfpp_training(cfg, expdir, n_steps=n_steps, exp=exp)
    total_dt = time.perf_counter() - t0

    # Marginal throughput: timed continuation without compiles.
    import jax

    t1 = time.perf_counter()
    extra = 500
    key = jax.random.key(123)
    for it in range(extra):
        if exp.device_step is not None:
            exp.state, m = exp.device_step(exp.state, jax.random.fold_in(key, it))
        else:
            b = nerfpp_sample_batch(exp)
            exp.state, m = exp.step_fn(exp.state, b, jax.random.fold_in(key, it))
    jax.block_until_ready(exp.state.params)
    marginal_dt = time.perf_counter() - t1
    final_metrics = {k: float(v) for k, v in m.items() if np.ndim(v) == 0}

    ev = evaluate_nerfpp(exp, max_views=1)
    report = {
        "n_steps": n_steps + extra,
        "fisheye": bool(fisheye),
        "n_rand": cfg.sampling.N_rand,
        "train_rays_per_sec_incl_compile": round(
            n_steps * cfg.sampling.N_rand / total_dt, 1),
        "train_rays_per_sec_marginal": round(
            extra * cfg.sampling.N_rand / marginal_dt, 1),
        "final_metrics": final_metrics,
        "finite": bool(all(np.isfinite(v) for v in final_metrics.values())),
        "heldout_eval": {k: (float(v) if isinstance(v, (int, float, np.floating))
                             or (hasattr(v, "ndim") and v.ndim == 0) else v)
                         for k, v in ev.items()},
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--fisheye", action="store_true",
                    help="soak the fisheye pipeline (distortion camera, "
                         "tied ray noise, multiplicative K)")
    a = ap.parse_args()
    main(a.steps, a.out, a.workdir, fisheye=a.fisheye)
