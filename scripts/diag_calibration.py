"""Focal/pose identifiability diagnostic for the analytic soak scene.

Round-3 VERDICT weak #2 asked why ``SOAK_NERF_QUALITY.json`` showed
``focal_rel_err`` pinned at 4.98% over 20k steps. This script isolates the
camera: it optimizes ONLY the camera parameters against the PRD loss with
EXACT correspondences (the same ``write_exact_matches`` pairs the soak
feeds through the .npz provider), removing the NeRF/photometric pathway
entirely, and sweeps the levers that could explain the stall:

  landscape   PRD as a function of focal alone, with GT poses vs noisy
              poses — is the minimum at the GT focal at all?
  additive    full-batch (all pairs per step) Adam on the additive
              parameterization (the camera_model default).
  mult        the same with ``multiplicative_noise`` — the parameterization
              the PUBLISHED reference scripts actually use
              (``/root/reference/demo.sh:10``, every main_table ours.sh).

Findings (CPU, 2026-08-19; full numbers in docs/calibration_convergence.md):
  * landscape: with GT poses, PRD(focal) has a clean minimum at the GT
    focal — focal IS observable from these matches. With noisy poses the
    landscape is monotonic across +-10%: pose error swamps the signal.
  * additive: poses compensate the 5% focal error (dolly-zoom valley) and
    the system settles at a near-stationary point (focal 4.86%, PRD 0.012)
    — Adam's per-parameter velocity is ~lr in noise units, which for the
    additive parameterization is PIXELS: the ~11px valley cannot be
    traversed in any realistic step budget.
  * mult: focal 5% -> 0.30% in 4k steps (PRD -> 6e-4): noise units are
    focal-FRACTIONS, so the same Adam velocity crosses the valley easily.

Usage: python scripts/diag_calibration.py [--steps 4000] [--out JSON]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def build_scene(workdir: str, radius: float = 4.0,
                camera_angle_x: float = 0.69, H: int = 120, W: int = 160):
    """GT/noisy cameras + exact matches for the soak's orbital geometry
    (poses identical to ``_analytic_scene.build_blender_scene``)."""
    from scnerf_tpu.data.blender import pose_spherical
    from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise
    from scnerf_tpu.matching.provider import PrecomputedMatches
    from soak_nerf import NOISE, write_exact_matches

    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    n_train = 12
    angles = [(360.0 * i / n_train,
               -30.0 + 15.0 * np.sin(4 * np.pi * i / n_train))
              for i in range(n_train)]
    gt_poses = np.stack(
        [np.array(pose_spherical(th, ph, radius)) for th, ph in angles])
    i_train = np.arange(n_train)
    noisy_poses, noisy_focal = inject_pose_noise(
        gt_poses, focal, i_train,
        NoiseConfig(intrinsic_scale=NOISE["intrinsic"],
                    rotation_deg=NOISE["rotation"],
                    translation=NOISE["translation"]))
    mp = os.path.join(workdir, f"matches_r{radius}.npz")
    write_exact_matches(mp, gt_poses, i_train, focal, H, W)
    cache = PrecomputedMatches(mp)
    pairs = cache.pairs()
    M = max(cache.get(i, j).kps0.shape[0] for i, j in pairs)
    K0 = np.zeros((len(pairs), M, 2), np.float32)
    K1 = np.zeros_like(K0)
    MK = np.zeros((len(pairs), M), np.float32)
    PI = np.zeros((len(pairs), 2), np.int32)
    for p, (i, j) in enumerate(pairs):
        m = cache.get(i, j)
        n = m.kps0.shape[0]
        K0[p, :n], K1[p, :n], MK[p, :n] = m.kps0, m.kps1, 1.0
        PI[p] = (i, j)
    return dict(focal=focal, noisy_focal=noisy_focal, gt_poses=gt_poses,
                noisy_poses=noisy_poses, i_train=i_train, H=H, W=W,
                K0=K0, K1=K1, MK=MK, PI=PI)


def _camera_errs(cam, sc):
    from soak_nerf import camera_errors

    class NS:
        pass

    e = NS()
    e.state = NS()
    e.state.params = {"camera": cam}
    e.gt_poses, e.i_train = sc["gt_poses"], sc["i_train"]
    gk = np.eye(4)
    gk[0, 0] = gk[1, 1] = sc["focal"]
    e.gt_intrinsic = gk
    return camera_errors(e)


def _pair_loss_fn(sc, threshold: float):
    import jax.numpy as jnp

    from scnerf_tpu.camera.model import get_extrinsic, get_intrinsic
    from scnerf_tpu.camera.rays import pixels_to_rays
    from scnerf_tpu.losses.prd import prd_loss

    K0j, K1j = jnp.asarray(sc["K0"]), jnp.asarray(sc["K1"])
    MKj, PIj = jnp.asarray(sc["MK"]), jnp.asarray(sc["PI"])

    def pair_loss(cam, pidx):
        k0, k1, mk, pi = K0j[pidx], K1j[pidx], MKj[pidx], PIj[pidx]
        r0 = pixels_to_rays(cam, k0[:, 0], k0[:, 1], image_idx=pi[0])
        r1 = pixels_to_rays(cam, k1[:, 0], k1[:, 1], image_idx=pi[1])
        l, n = prd_loss(k0, k1, r0, r1, get_intrinsic(cam),
                        get_extrinsic(cam, pi), mask=mk > 0,
                        threshold=threshold, method="NeRF", mode="train")
        return jnp.where(n > 0, l, 0.0)

    return pair_loss


def _make_camera(sc, focal_value: float, poses, mult: bool):
    from scnerf_tpu.camera.model import CameraConfig, init_camera

    cfg = CameraConfig(H=sc["H"], W=sc["W"], convention="opengl",
                       multiplicative_noise=mult,
                       ray_o_noise_scale=1e-4, ray_d_noise_scale=1e-4,
                       extrinsics_noise_scale=1.0)
    Kn = np.eye(4)
    Kn[0, 0] = Kn[1, 1] = focal_value
    Kn[0, 2], Kn[1, 2] = sc["W"] / 2.0, sc["H"] / 2.0
    return init_camera(Kn, poses[sc["i_train"]], cfg)


def landscape(sc, threshold: float = 1e6) -> dict:
    """PRD vs focal-scale, GT poses vs noisy poses."""
    pair_loss = _pair_loss_fn(sc, threshold)
    npairs = sc["K0"].shape[0]
    out = {}
    for poses, tag in ((sc["gt_poses"], "gt_poses"),
                       (sc["noisy_poses"], "noisy_poses")):
        row = {}
        for frac in (0.9, 0.95, 1.0, 1.05, 1.1):
            cam = _make_camera(sc, sc["focal"] * frac, poses, mult=False)
            row[f"{frac:.2f}"] = float(np.mean(
                [float(pair_loss(cam, p)) for p in range(npairs)]))
        out[tag] = row
        print(f"[landscape/{tag}] {row}", flush=True)
    return out


def optimize(sc, tag: str, steps: int, mult: bool, lr: float = 5e-4,
             decay_steps: float = 2000.0, threshold: float = 5.0) -> list:
    """Full-batch camera-only PRD optimization (production optimizer)."""
    import jax
    import jax.numpy as jnp
    import optax

    from scnerf_tpu.train.optim import make_optimizer

    pair_loss = _pair_loss_fn(sc, threshold)
    npairs = sc["K0"].shape[0]
    cam = _make_camera(sc, sc["noisy_focal"], sc["noisy_poses"], mult)
    tx = make_optimizer(lr, decay_steps=decay_steps,
                        params_example={"camera": cam})

    def total_loss(params):
        ls = jax.vmap(lambda p: pair_loss(params["camera"], p))(
            jnp.arange(npairs))
        return jnp.mean(ls)

    @jax.jit
    def step_fn(params, opt):
        l, g = jax.value_and_grad(total_loss)(params)
        g = {"camera": g["camera"].replace(
            ray_o_grid=jnp.zeros_like(g["camera"].ray_o_grid),
            ray_d_grid=jnp.zeros_like(g["camera"].ray_d_grid))}
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l

    params = {"camera": cam}
    opt = tx.init(params)
    hist = []
    for s in range(steps + 1):
        if s % max(steps // 8, 1) == 0 or s == steps:
            e = _camera_errs(params["camera"], sc)
            e["step"] = s
            e["prd"] = float(total_loss(params))
            hist.append(e)
            print(f"[{tag}] step {s}: focal={e['focal_rel_err']:.4f} "
                  f"rot={e['rot_err_deg']:.3f} trans={e['trans_err']:.4f} "
                  f"prd={e['prd']:.5f}", flush=True)
        if s == steps:
            break
        params, opt, _ = step_fn(params, opt)
    return hist


def main(steps: int, out_json: str | None, workdir: str | None) -> dict:
    import tempfile

    import jax

    workdir = workdir or tempfile.mkdtemp(prefix="diag_cal_")
    sc = build_scene(workdir)
    report = {
        "scene": "soak orbital geometry (12 cams, radius 4, FOV 39.5deg)",
        "landscape_prd_vs_focalscale": landscape(sc),
        "additive": optimize(sc, "additive", steps, mult=False),
        "multiplicative": optimize(sc, "mult", steps, mult=True),
        "backend": jax.default_backend(),
    }
    add_f = report["additive"][-1]["focal_rel_err"]
    mul_f = report["multiplicative"][-1]["focal_rel_err"]
    report["verdict"] = {
        "additive_final_focal_rel_err": add_f,
        "multiplicative_final_focal_rel_err": mul_f,
        "multiplicative_converges": bool(mul_f < 0.01),
        "additive_stalls": bool(add_f > 0.03),
    }
    print(json.dumps(report["verdict"], indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    a = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")  # pure camera math: CPU is fine
    main(a.steps, a.out, a.workdir)
