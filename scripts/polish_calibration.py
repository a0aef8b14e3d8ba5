"""Post-training calibration polish: can the joint-training rotation
plateau (~0.5 deg, CALIBRATION_SWEEP.json) be broken after the fact?

Camera-only PRD optimization converges to 0.2 deg and falling
(``scripts/diag_calibration.py``), but the full joint trainer plateaus
~0.5 deg: once the field co-adapts to the slightly-wrong cameras, the
photometric term stops pulling and the 1e-4-weight PRD share of the
joint gradient is too small. This script tests the obvious two-phase
remedy on a FINISHED soak experiment (an alternating-optimization
sweep, one alternation):

  phase A  camera polish: full-batch PRD over every cached pair,
           Adam on the global calibration leaves ONLY (intrinsics/
           extrinsics noise — ``train/optim.py:camera_pose_mask``),
           field frozen. PRD construction is bit-identical to the
           production step (``train/step.py:125-149``).
  phase B  field refit: the production train step with the polished
           camera pinned after every update (the field re-fits the
           corrected rays; co-adaptation is why a better camera
           initially renders WORSE — docs/heldout_gap.md).

Reports camera errors + held-out PSNR at baseline / after A / after B.

Usage: python scripts/polish_calibration.py --workdir /tmp/soak_nerf_r4c \
           [--polish_steps 3000] [--refit_steps 3000] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def load_experiment(workdir: str):
    from soak_nerf import NOISE
    from scnerf_tpu.core.config import experiment_from_flags
    from scnerf_tpu.train.driver import build_experiment

    snap = json.load(open(os.path.join(workdir, "soak", "config.json")))
    cfg = experiment_from_flags({
        # optimizer-affecting knobs must replay or the opt_state tree
        # mismatches on restore (see diag_rot_plateau.py)
        "camera_lrate_mult": snap["optim"].get("camera_lrate_mult", 1.0),
        "camera_lrate_mult_until": snap["optim"].get(
            "camera_lrate_mult_until", 0),
        "dataset_type": "blender",
        "datadir": os.path.join(workdir, "scene"), "testskip": 1,
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
    return build_experiment(cfg, os.path.join(workdir, "soak"))


def stack_all_pairs(exp, match_num: int):
    """Every cached pair, padded to ``match_num`` matches: arrays shaped
    (P, M, 2) kps, (P, M) mask, (P, 2) pair indices."""
    from scnerf_tpu.matching.provider import pad_matches

    k0, k1, msk, idx = [], [], [], []
    for i, j in exp.pair_list:
        m = exp.match_cache.get(int(i), int(j))
        if m is None or m.kps0.shape[0] == 0:
            continue
        a, b, v = pad_matches(m, match_num)
        k0.append(a), k1.append(b), msk.append(v), idx.append((i, j))
    return (np.stack(k0), np.stack(k1), np.stack(msk),
            np.asarray(idx, np.int32))


def polish_camera(exp, steps: int, lr: float = 5e-4):
    """Phase A: full-batch PRD Adam on the calibration leaves only."""
    import jax
    import jax.numpy as jnp
    import optax

    from scnerf_tpu.camera.model import get_extrinsic, get_intrinsic
    from scnerf_tpu.camera.rays import pixels_to_rays
    from scnerf_tpu.losses.prd import prd_loss
    from scnerf_tpu.train.optim import camera_pose_mask

    cam0 = exp.state.params["camera"]
    K0, K1, MSK, IDX = stack_all_pairs(exp, exp.cfg.camera.match_num)
    K0, K1 = jnp.asarray(K0), jnp.asarray(K1)
    MSK, IDX = jnp.asarray(MSK), jnp.asarray(IDX)
    thresh = float(exp.cfg.camera.proj_ray_dist_threshold)

    def pair_loss(cam, k0, k1, m, ij):
        # identical construction to train/step.py:125-149
        r0 = pixels_to_rays(cam, k0[:, 0], k0[:, 1], image_idx=ij[0])
        r1 = pixels_to_rays(cam, k1[:, 0], k1[:, 1], image_idx=ij[1])
        K4 = get_intrinsic(cam)
        E = get_extrinsic(cam, jnp.stack([ij[0], ij[1]]))
        prd, n = prd_loss(k0, k1, r0, r1, K4, E, mask=m,
                          threshold=thresh, method="NeRF", mode="train")
        return jnp.where(n > 0, prd, 0.0)

    def total_loss(cam):
        losses = jax.vmap(pair_loss, in_axes=(None, 0, 0, 0, 0))(
            cam, K0, K1, MSK, IDX)
        return losses.mean()

    mask = camera_pose_mask({"camera": cam0})["camera"]
    tx = optax.chain(
        optax.masked(optax.adam(lr), mask),
        optax.masked(optax.set_to_zero(),
                     jax.tree.map(lambda b: not b, mask)),
    )
    opt = tx.init(cam0)

    @jax.jit
    def step_fn(cam, opt):
        l, g = jax.value_and_grad(total_loss)(cam)
        up, opt = tx.update(g, opt, cam)
        return optax.apply_updates(cam, up), opt, l

    cam, hist = cam0, []
    for i in range(steps):
        cam, opt, l = step_fn(cam, opt)
        if i % max(steps // 10, 1) == 0:
            hist.append({"step": i, "prd": float(l)})
            print(f"[polish] {i} prd={float(l):.6f}", flush=True)
    return cam, hist


def refit_field(exp, steps: int, pinned_cam):
    """Phase B: production train step; camera pinned after every update."""
    import jax

    from scnerf_tpu.train.driver import sample_batch

    key = jax.random.key(20260819)
    exp.state.params["camera"] = pinned_cam
    for i in range(steps):
        b = sample_batch(exp, 10 ** 7 + i)  # past every curriculum horizon
        exp.state, m = exp.step_fn(exp.state, b, jax.random.fold_in(key, i))
        exp.state.params["camera"] = pinned_cam
        if i % max(steps // 10, 1) == 0:
            print(f"[refit] {i} loss={float(m['loss']):.6f}", flush=True)
    return exp


def snapshot(exp, tag: str) -> dict:
    from soak_nerf import camera_errors
    from scnerf_tpu.train.driver import evaluate_test_views

    ev = evaluate_test_views(exp, max_views=None)
    row = {"tag": tag, "heldout_psnr": round(float(ev["psnr"]), 2),
           **{k: round(float(v), 5) for k, v in camera_errors(exp).items()}}
    print(f"[snap] {json.dumps(row)}", flush=True)
    return row


def main(workdir: str, out_json: str | None, polish_steps: int,
         refit_steps: int) -> dict:
    from soak_nerf import preflight

    preflight()  # REQUIRED under _watchdog.supervise(): it watches for
    # the "[preflight]" line and kills+retries runs that never print it.
    exp = load_experiment(workdir)
    t0 = time.perf_counter()
    rows = [snapshot(exp, "baseline")]

    cam1, hist = polish_camera(exp, polish_steps)
    exp.state.params["camera"] = cam1
    rows.append(snapshot(exp, "after_polish"))

    exp = refit_field(exp, refit_steps, cam1)
    rows.append(snapshot(exp, "after_refit"))

    base, pol, ref = rows
    report = {
        "workdir": workdir, "restored_step": int(exp.state.step),
        "polish_steps": polish_steps, "refit_steps": refit_steps,
        "phases": rows, "prd_curve": hist,
        "rot_improved": bool(ref["rot_err_deg"] < base["rot_err_deg"]),
        "psnr_improved": bool(ref["heldout_psnr"] > base["heldout_psnr"]),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(report, indent=2))
    if out_json:
        json.dump(report, open(out_json, "w"), indent=2)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/soak_nerf_r4c")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--polish_steps", type=int, default=3000)
    ap.add_argument("--refit_steps", type=int, default=3000)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from _watchdog import supervise

        supervise()
    main(a.workdir, a.out, a.polish_steps, a.refit_steps)
