"""Attribute the quality soak's rotation-error plateau (round-4b).

The soak's ``rot_err_deg`` metric compares the learned EXTRINSICS alone
against Sim(3)-aligned GT poses (``soak_nerf.camera_errors``). But the
learned camera's ray o/d noise grids (reference
``model/camera_model.py:205-262``) can absorb a per-view rotation-like
correction: a constant direction offset over the image is, to first
order, a small rotation composed with the extrinsic. If the grids have
soaked up the residual, the extrinsics-only metric overstates the TRUE
(ray-space) miscalibration, and the "plateau" is a gauge artifact, not
a calibration failure.

This script decomposes the final ray-bundle error per train view:

  total       mean angle between the FULL learned rays (extrinsics +
              learned K + noise grids) and the GT rays
  extr_only   mean angle using extrinsics + learned K, grids OFF —
              what the soak metric effectively measures in ray space
  resid       total after removing each view's best-fit rotation
              (Kabsch on the direction bundles) — the non-rotational,
              physically-unabsorbable part

If total << extr_only, the grids compensate the extrinsic residual and
the effective camera is better-calibrated than ``rot_err_deg`` implies.

Usage (CPU, safe to run while a TPU job holds the chip):
  python scripts/diag_rot_plateau.py --workdir /tmp/soak_nerf_r4b
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def best_rotation_angle(d_a: np.ndarray, d_b: np.ndarray):
    """Kabsch: angle of the rotation best mapping unit dirs d_a -> d_b,
    and the residual mean angle after applying it."""
    H = d_a.T @ d_b
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))
    d_fit = d_a @ R.T
    resid = mean_angle(d_fit, d_b)
    return float(ang), float(resid)


def mean_angle(d_a: np.ndarray, d_b: np.ndarray) -> float:
    dots = np.clip(np.sum(d_a * d_b, axis=-1), -1.0, 1.0)
    return float(np.degrees(np.arccos(dots)).mean())


def main(workdir: str, out_json: str | None, stride: int = 4):
    import jax

    jax.config.update("jax_platforms", "cpu")  # never contend for the chip
    import jax.numpy as jnp

    from soak_nerf import NOISE
    from scnerf_tpu.camera.model import get_extrinsics, get_intrinsic
    from scnerf_tpu.camera.rays import full_image_pixels, pixels_to_rays
    from scnerf_tpu.core.config import experiment_from_flags
    from scnerf_tpu.geometry.alignment import align_c2w_trajectories, apply_sim3
    from scnerf_tpu.train.driver import build_experiment

    scene = os.path.join(workdir, "scene")
    # Optimizer-affecting knobs must match the run exactly or the orbax
    # opt_state tree mismatches (camera_lrate_mult adds a chain element).
    snap = json.load(open(os.path.join(workdir, "soak", "config.json")))
    # Same flag set as scripts/soak_nerf.py main() — the expdir restore
    # brings in the trained params; the dataset/noise replay is seeded.
    cfg = experiment_from_flags({
        "camera_lrate_mult": snap["optim"].get("camera_lrate_mult", 1.0),
        "camera_lrate_mult_until": snap["optim"].get(
            "camera_lrate_mult_until", 0),
        "ray_dist_loss_weight": snap["camera"].get(
            "ray_dist_loss_weight", 1e-4),
        "dataset_type": "blender", "datadir": scene, "testskip": 1,
        "N_rand": 1024, "N_samples": 64, "N_importance": 64,
        "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
        "multiplicative_noise": True,
        "ray_loss_type": "proj_ray_dist", "matcher": "sift",
        "i_ray_dist_loss": 10, "add_ie": 0, "add_od": 1000,
        "add_prd": 2000,
        "initial_noise_size_intrinsic": NOISE["intrinsic"],
        "initial_noise_size_rotation": NOISE["rotation"],
        "initial_noise_size_translation": NOISE["translation"],
    })
    exp = build_experiment(cfg, os.path.join(workdir, "soak"))
    step = int(exp.state.step)
    cam = exp.state.params["camera"]

    # Sim(3)-align GT onto the learned trajectory (exact soak-metric gauge).
    learned_extr = np.asarray(get_extrinsics(cam), np.float64)
    gt = exp.gt_poses[exp.i_train]
    _, (s, R, t) = align_c2w_trajectories(
        jnp.asarray(gt), jnp.asarray(learned_extr, jnp.float32))
    aligned = np.asarray(apply_sim3(jnp.asarray(gt), s, R, t), np.float64)
    Ra = aligned[:, :3, :3] / np.cbrt(
        np.linalg.det(aligned[:, :3, :3]))[:, None, None]

    px, py = full_image_pixels(exp.H, exp.W)
    px, py = px[::stride], py[::stride]
    K_gt = np.asarray(exp.gt_intrinsic, np.float64)
    rows = []
    for li, gi in enumerate(exp.i_train):
        # GT ray dirs in the aligned gauge (OPENGL convention like the
        # loader: +0.5-centered pixels, y/z flipped).
        u = (np.asarray(px) + 0.5 - K_gt[0, 2]) / K_gt[0, 0]
        v = -(np.asarray(py) + 0.5 - K_gt[1, 2]) / K_gt[1, 1]
        dirs_c = np.stack([u, v, -np.ones_like(u)], -1)
        d_gt = dirs_c @ Ra[li].T
        d_gt /= np.linalg.norm(d_gt, axis=-1, keepdims=True)
        o_gt = np.broadcast_to(aligned[li, :3, 3], d_gt.shape)

        idx = jnp.full(px.shape, li, jnp.int32)
        o_full, d_full = pixels_to_rays(cam, px, py, image_idx=idx,
                                        add_noise=True)
        o_ext, d_ext = pixels_to_rays(cam, px, py, image_idx=idx,
                                      add_noise=False)
        d_full = np.asarray(d_full, np.float64)
        d_ext = np.asarray(d_ext, np.float64)
        d_ext /= np.linalg.norm(d_ext, axis=-1, keepdims=True)

        fit_ang, resid = best_rotation_angle(d_full, d_gt)
        rows.append({
            "view": int(gi),
            "total_deg": mean_angle(d_full, d_gt),
            "extr_only_deg": mean_angle(d_ext, d_gt),
            "best_fit_rot_deg": fit_ang,
            "resid_after_rot_deg": resid,
            "origin_err_full": float(np.linalg.norm(
                np.asarray(o_full, np.float64) - o_gt, axis=-1).mean()),
            "origin_err_extr": float(np.linalg.norm(
                np.asarray(o_ext, np.float64) - o_gt, axis=-1).mean()),
        })

    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k != "view"}
    report = {
        "workdir": workdir, "restored_step": step, "stride": stride,
        "gauge": "Sim(3) GT->learned (identical to soak camera_errors)",
        "per_view": rows, "mean": mean,
        "reading": (
            "grids compensate the extrinsic residual (gauge freedom)"
            if mean["total_deg"] < 0.5 * mean["extr_only_deg"]
            else "residual is real ray-space miscalibration"),
    }
    print(json.dumps({k: report[k] for k in report if k != "per_view"},
                     indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/soak_nerf_r4b")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--stride", type=int, default=4)
    a = ap.parse_args()
    main(a.workdir, a.out, stride=a.stride)
