"""Long-run QUALITY soak of the NeRF++ driver on the real TPU chip.

Exercises the full production path end-to-end — split-dir loader,
learnable camera (OPENCV + noise grids; the tied-noise Distortion variant
in ``--fisheye`` mode), cascade fg/bg render, PRD cadence with exact
offline matches, curriculum, checkpointing, periodic held-out eval — on a
geometrically CONSISTENT analytic 3D scene (``scripts/_analytic_scene.py``)
so the run asserts QUALITY (held-out PSNR gate over >=2 validation views),
not just throughput and finiteness (round-2 VERDICT items 2/7).

Complements the CPU trajectory-parity harness
(scripts/ref_parity_nerfpp.py): that one proves we match the reference;
this one proves the production driver converges at scale on TPU.

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

SCALE = 0.2  # analytic blob scene scaled inside the NeRF++ unit fg sphere


def preflight():
    """First-op canary against axon session-setup wedges (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    v = (jnp.arange(4.0) @ jnp.ones((4,))).block_until_ready()
    print(f"[preflight] backend={jax.default_backend()} ok ({float(v)})",
          flush=True)


def write_exact_matches_opencv(path: str, poses, intrinsics, H: int, W: int,
                               n_pts: int = 600, min_matches: int = 16,
                               scene_scale: float = SCALE,
                               dist_k=None) -> int:
    """Exact correspondences on the scaled analytic blobs, projected
    through the OPENCV train cameras with the production pixel convention
    (``px + 0.5 -> K^-1``, so ``px = fx*x/z + cx - 0.5``).

    ``dist_k``: when given, apply the TRUE radial warp to the projected
    pixels (the reference's normalized-per-axis model,
    ``nerf_sample_ray_split.py:227-232``) — matches live in DISTORTED
    image space, exactly like real SuperGlue keypoints on fisheye
    captures. Used by the PRD-assisted from-scratch protocol, where the
    distortion-aware PRD (``camera/distortion.py`` + ``prd_undistort``)
    must recover k from these coordinates."""
    from _analytic_scene import _CENTERS, _WIDTHS

    from scnerf_tpu.matching.provider import PairMatches, PrecomputedMatches

    rng = np.random.RandomState(7)
    pts = np.concatenate([
        c * scene_scale + rng.randn(n_pts // len(_CENTERS), 3)
        * np.sqrt(w / 2.0) * scene_scale
        for c, w in zip(_CENTERS, _WIDTHS)
    ])

    def project(c2w, K):
        import jax.numpy as jnp

        from scnerf_tpu.camera.distortion import undistort_pixels

        cam = (pts - c2w[:3, 3]) @ c2w[:3, :3]  # world -> camera (R^T)
        z = cam[:, 2]
        # continuous pinhole coords (the production convention adds the
        # half-pixel before K^-1, so the stored keypoint is continuous-0.5)
        u = K[0, 0] * cam[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
        v = K[1, 1] * cam[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
        ok = z > 0.05
        if dist_k is not None:
            # observed (raw fisheye) pixel = inverse radial warp of the
            # pinhole projection — same generation as the oracle-tested
            # examples/distortion_discovery.py rig.
            valid, xy = undistort_pixels(W, H, jnp.asarray(dist_k, jnp.float32),
                                         jnp.asarray(u, jnp.float32),
                                         jnp.asarray(v, jnp.float32))
            u, v = np.asarray(xy[:, 0], np.float64), np.asarray(xy[:, 1], np.float64)
            ok = ok & np.asarray(valid)
        u, v = u - 0.5, v - 0.5
        ok = ok & (u >= 1) & (u < W - 2) & (v >= 1) & (v < H - 2)
        return np.stack([u, v], -1).astype(np.float32), ok

    cache = PrecomputedMatches()
    n_pairs = 0
    for a in range(len(poses)):
        for b in range(a + 1, len(poses)):
            pa, oka = project(poses[a], intrinsics[a])
            pb, okb = project(poses[b], intrinsics[b])
            ok = oka & okb
            if ok.sum() >= min_matches:
                cache.put(a, b, PairMatches(pa[ok], pb[ok]))
                n_pairs += 1
    cache.save(path)
    return n_pairs


SCRATCH_NOISE = dict(rotation_deg=1.0, translation=0.02, focal_mult=1.05)


def corrupt_train_split(scene: str, rng_seed: int = 3) -> str:
    """FROM-SCRATCH protocol (BASELINE config 5, 'FishEyeNeRF
    self-calibration from scratch'): the images stay rendered by the TRUE
    distorted camera, but the TRAIN split's camera files are corrupted —
    radial distortion zeroed (the run must DISCOVER k), focal scaled by
    5%, poses perturbed by 1 deg / 0.02 — so the learnable camera starts
    from a miscalibrated state exactly like the reference's injected-noise
    protocol (``load_llff.py:319-360``). Val/test splits stay truthful.
    Returns the path of the saved true-camera .npz (for error metrics)."""
    import glob

    from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise

    d = os.path.join(scene, "train")
    intr_files = sorted(glob.glob(os.path.join(d, "intrinsics", "*.txt")))
    pose_files = sorted(glob.glob(os.path.join(d, "pose", "*.txt")))
    Ks, ks, poses = [], [], []
    for f in intr_files:
        vals = np.array([float(x) for x in open(f).read().split()])
        Ks.append(vals[:16].reshape(4, 4))
        ks.append(vals[16:18] if len(vals) >= 18 else np.zeros(2))
    for f in pose_files:
        poses.append(np.array([float(x) for x in open(f).read().split()])
                     .reshape(4, 4))
    Ks, ks, poses = np.stack(Ks), np.stack(ks), np.stack(poses)
    true_npz = os.path.join(scene, "true_train_cams.npz")
    np.savez(true_npz, poses=poses, K=Ks[0], k=ks[0])

    noisy, _ = inject_pose_noise(
        poses, float(Ks[0, 0, 0]), np.arange(len(poses)),
        NoiseConfig(rotation_deg=SCRATCH_NOISE["rotation_deg"],
                    translation=SCRATCH_NOISE["translation"]),
        rng=np.random.RandomState(rng_seed))
    for i, f in enumerate(intr_files):
        K = Ks[i].copy()
        K[0, 0] *= SCRATCH_NOISE["focal_mult"]
        K[1, 1] *= SCRATCH_NOISE["focal_mult"]
        out = list(K.reshape(-1)) + [0.0, 0.0]  # k zeroed: discover it
        open(f, "w").write(" ".join(repr(float(x)) for x in out))
    for i, f in enumerate(pose_files):
        open(f, "w").write(" ".join(repr(float(x))
                                    for x in noisy[i].reshape(-1)))
    return true_npz


def scratch_camera_errors(exp, true_npz: str) -> dict:
    """Learned camera vs the TRUE (pre-corruption) train cameras:
    Sim(3)-aligned rotation/translation error, focal relative error, and
    radial-distortion error (the soak_nerf.py protocol, OPENCV side)."""
    import jax.numpy as jnp

    from scnerf_tpu.camera.model import (get_distortion, get_extrinsics,
                                         get_intrinsic)
    from scnerf_tpu.geometry.alignment import (align_c2w_trajectories,
                                               apply_sim3)

    cam = exp.state.params.get("camera")
    if cam is None:
        return {}
    t = np.load(true_npz)
    learned = np.asarray(get_extrinsics(cam), np.float64)
    _, (s, R, tt) = align_c2w_trajectories(
        jnp.asarray(t["poses"], jnp.float32),
        jnp.asarray(learned, jnp.float32))
    aligned = np.asarray(apply_sim3(jnp.asarray(t["poses"], jnp.float32),
                                    s, R, tt), np.float64)
    Ra = aligned[:, :3, :3]
    Ra = Ra / np.cbrt(np.linalg.det(Ra))[:, None, None]
    fro = np.linalg.norm((Ra - learned[:, :3, :3]).reshape(-1, 9), axis=-1)
    rot_deg = np.degrees(2.0 * np.arcsin(
        np.clip(fro / (2.0 * np.sqrt(2.0)), 0.0, 1.0)))
    trans = np.linalg.norm(aligned[:, :3, 3] - learned[:, :3, 3], axis=-1)
    K = np.asarray(get_intrinsic(cam))
    f_gt = float(t["K"][0, 0])
    k_learned = np.asarray(get_distortion(cam), np.float64)
    k_gt = np.asarray(t["k"], np.float64)
    return {
        "rot_err_deg": float(rot_deg.mean()),
        "trans_err": float(trans.mean()),
        "focal_rel_err": float(abs(K[0, 0] - f_gt) / f_gt),
        "k1_err": float(abs(k_learned[0] - k_gt[0])),
        "k2_err": float(abs(k_learned[1] - k_gt[1])),
        "k_learned": [float(x) for x in k_learned],
    }


def main(n_steps: int, out_json: str | None, workdir: str | None,
         fisheye: bool = False, eval_every: int = 1000,
         psnr_gate: float = 25.0, from_scratch: bool = False,
         small: bool = False, camera_lr_mult: float = 1.0,
         wide_fov: bool = False, distortion_lr_mult: float = 1.0,
         mult_until: int = 0, add_radial_step: int = -1,
         add_ie_step: int = -1, fisheye_prd: bool = False,
         add_od_step: int = -1, strong_k: bool = False,
         sift_matches: bool = False, n_train: int = 8,
         prd_weight: float = 1e-4, prd_cadence: int = 10,
         hires: bool = False, add_prd_step: int = -1,
         prd_until: int = 0):
    preflight()
    assert not (from_scratch and not fisheye), \
        "--from_scratch is the fisheye self-calibration protocol"
    workdir = workdir or tempfile.mkdtemp(prefix="soak_nerfpp_")
    datadir = os.path.join(workdir, "data")
    from _analytic_scene import build_nerfpp_scene

    # --strong_k: real-fisheye distortion magnitude (|k1| 0.35 vs the default
    # 0.12; FishEyeNeRF captures are at this order — the default scene's
    # median distortion displacement is sub-pixel, round-4d analysis).
    dist_k = ((-0.35, 0.10) if strong_k else (-0.12, 0.04)) if fisheye else None
    H, W = (40, 56) if small else ((240, 320) if hires else (120, 160))
    # --wide_fov: k-OBSERVABILITY variant — wider FOV + bigger blobs so
    # content reaches high normalized radius (median distortion
    # displacement ~0.2 px at the default geometry, so k is photometrically
    # near-unobservable there; docs/calibration_convergence.md round-4d).
    focal_scale, scene_scale = (0.5, 0.32) if wide_fov else (0.9, SCALE)
    # --sift_matches (PRODUCTION matcher path): PRD correspondences come
    # from the real SIFT provider run on the rendered (distorted) images —
    # no oracle points anywhere. Needs the textured scene variant (smooth
    # gaussians give a DoG detector nothing) and a denser camera ring
    # (SIFT matching degrades past ~30 deg view separation).
    assert not (sift_matches and not fisheye_prd), \
        "--sift_matches is the production-matcher variant of --fisheye_prd"
    scene = build_nerfpp_scene(datadir, n_train=n_train, n_val=2, H=H, W=W,
                               dist_k=dist_k, scale=scene_scale,
                               focal_scale=focal_scale,
                               texture=sift_matches)
    true_npz = corrupt_train_split(scene) if from_scratch else None

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
    cfg.sampling.N_rand = 256 if small else 2048
    cfg.sampling.device_sampling = True
    cfg.model.cascade_samples = (8, 8) if small else (64, 64)
    if small:
        cfg.model.netdepth = 2
        cfg.model.netwidth = 32
        cfg.model.multires = 4
        cfg.model.multires_views = 2
    cfg.camera.camera_model = "pinhole_rot_noise_10k_rayo_rayd"
    cfg.camera.matcher = "sift"
    # The analytic rig's 8-view ring spaces adjacent views ~36 deg apart,
    # ABOVE the reference's 30-deg pairing default — with 30 the PRD pair
    # list is EMPTY and the PRD step silently never dispatches (found r5:
    # legs E/G ran with fisheye_prd vacuously off; the old assert checked
    # the match CACHE, which is written for all C(n,2) pairs, not the
    # pair list that actually gates dispatch). 45 admits exactly the
    # adjacent-ring pairs; --n_train >= 12 brings spacing back under 30.
    cfg.camera.pairing_angle_threshold = 45.0
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
        # The PUBLISHED curriculum is late-unfreeze and staged
        # (fisheyenerf/globe_ours.txt: N_iters 1.5M, add_ie 500k,
        # add_radial 800k, add_od 1.1M): the field fits FIRST, then K/E,
        # then radial, then grids. Replicate the proportions at soak
        # timescale — unfreezing everything near step 0 lets the field
        # co-adapt to the uncalibrated camera and k never recovers
        # (measured: k stuck at +0.003 vs true -0.12 over 20k steps with
        # add_ie=0/add_radial=500).
        cfg.camera.add_ie = max(n_steps // 3, 1)
        cfg.camera.add_radial = max(8 * n_steps // 15, 2)
        cfg.camera.add_od = max(11 * n_steps // 15, 3)
        if add_radial_step >= 0:
            # Experiment override: unfreeze k earlier/later than the
            # published proportions (round-4f k-recovery dynamics study).
            cfg.camera.add_radial = max(add_radial_step, 2)
        if add_ie_step >= 0:
            cfg.camera.add_ie = max(add_ie_step, 1)
        if add_od_step >= 0:
            # Experiment override: defer (or advance) the per-image OD-grid
            # unfreeze. Round-4f leg A showed the mult-16 k estimate being
            # destabilized exactly at the OD unfreeze (k1 -0.010 -> +0.23
            # between steps 7000 and 7500 with add_od=7333); deferring OD
            # past the annealed calibration phase isolates that interaction.
            cfg.camera.add_od = max(add_od_step, 3)
        if fisheye_prd:
            # The from-scratch k-recovery recipe: distortion-aware PRD on
            # exact matches in DISTORTED pixel space (prd_on_fisheye +
            # prd_undistort; the reference cannot do this — its PRD is
            # distortion-blind and fisheye runs skip it).
            cfg.camera.ray_loss_type = "proj_ray_dist"
            cfg.camera.prd_on_fisheye = True
            cfg.camera.prd_undistort = True
            cfg.camera.add_prd = cfg.camera.add_radial
            if add_prd_step >= 0:
                # Camera-first alternative to the joint-unfreeze recipe: open
                # PRD with the ie phase so pose/focal converge FIRST; when
                # radial opens later the k landscape conditional on a near-GT
                # camera is the exact oracle one (round-4d). Guards against
                # the k-leads-camera conditional trap
                # (docs/calibration_convergence.md round-5c,
                # K_G_conditionaltrap.json).
                cfg.camera.add_prd = max(add_prd_step, 1)
            cfg.camera.i_ray_dist_loss = prd_cadence
            # PRD is the ONLY consistent k signal in this regime (the
            # photometric k gradient is transient-dominated at sub-pixel
            # distortion; K_G_vacuousprd_control.json: photometric-only k
            # parks wrong-sign and never moves) — the k-recovery protocol
            # raises weight/cadence above the reference defaults.
            cfg.camera.ray_dist_loss_weight = prd_weight
            if prd_until > 0:
                # End the CALIBRATION PHASE for the PRD protocol too: leg J
                # (K_J_annealed_horizon.json) showed that annealing only the
                # camera-LR mults leaves the hot PRD pushing k past truth
                # along the rot<->k degenerate valley (k1 exact at 7500,
                # then monotone overshoot). At prd_until the weight/cadence
                # return to the published protocol (1e-4, every 10).
                cfg.camera.prd_anneal_until = prd_until
                cfg.camera.ray_dist_loss_weight_after = 1e-4
                cfg.camera.i_ray_dist_loss_after = 10
    if from_scratch:
        # k must traverse from 0 to (-0.12, 0.04). At the default noise
        # scale 1e-2 Adam's ~lr-per-step parameter velocity would need
        # >20k ideal steps just for k1 (the additive-parameterization trap
        # of docs/calibration_convergence.md); 0.1 makes the trip ~10x
        # shorter while keeping the last-digit resolution ample.
        cfg.camera.distortion_noise_scale = 0.1
    cfg.optim.lrate_decay_steps = 750_000
    # Calibration-LR extension (default 1.0 = reference-exact shared LR).
    # The from-scratch protocol must traverse finite distances in noise
    # units; see docs/calibration_convergence.md round-4b sweep.
    cfg.optim.camera_lrate_mult = camera_lr_mult
    # k-specific velocity boost (composes with camera mult): |k1|=0.12 is
    # 12 noise-units even at the raised from-scratch scale 0.1, vs 0.05
    # units for focal — see docs/calibration_convergence.md round-4f.
    cfg.optim.distortion_lrate_mult = distortion_lr_mult
    if mult_until > 0:
        cfg.optim.camera_lrate_mult_until = mult_until
        cfg.optim.distortion_lrate_mult_until = mult_until
    cfg.logging.expname = "soak"
    cfg.logging.basedir = workdir
    cfg.logging.i_print = 1000
    cfg.logging.i_weights = max(n_steps // 2, 1)
    cfg.logging.i_img = 10 ** 9
    cfg.logging.i_testset = 10 ** 9  # eval runs in the segment loop below

    expdir = os.path.join(workdir, "soak")
    os.makedirs(expdir, exist_ok=True)

    if not fisheye:
        # Exact offline matches through the production .npz provider path
        # (build_nerfpp_experiment prefers expdir/matches.npz over SIFT).
        from scnerf_tpu.data.nerfpp_split import load_nerfpp_split

        train0 = load_nerfpp_split(scene, "train")
        n_pairs = write_exact_matches_opencv(
            os.path.join(expdir, "matches.npz"), train0.poses,
            train0.intrinsics, train0.H, train0.W)
        print(f"[soak] exact-match cache: {n_pairs} train pairs", flush=True)
    elif fisheye_prd and sift_matches:
        # No matches.npz is written: build_nerfpp_experiment falls back to
        # the SIFT provider (cfg.camera.matcher) on the rendered fisheye
        # images — keypoints in raw distorted pixel space, exactly like
        # real captures. Nothing oracle enters the run.
        print("[soak] PRD matches from the SIFT provider on rendered "
              "images (production path)", flush=True)
    elif fisheye_prd:
        # Matches come from the IMAGES, i.e. from the TRUE distorted
        # cameras (pre-corruption), in raw fisheye pixel coordinates.
        if true_npz:
            t = np.load(true_npz)
            poses0, K0 = t["poses"], np.tile(t["K"], (len(t["poses"]), 1, 1))
            k_true = t["k"]
        else:
            from scnerf_tpu.data.nerfpp_split import load_nerfpp_split

            train0 = load_nerfpp_split(scene, "train")
            poses0, K0, k_true = train0.poses, train0.intrinsics, np.asarray(dist_k)
        n_pairs = write_exact_matches_opencv(
            os.path.join(expdir, "matches.npz"), poses0, K0, H, W,
            scene_scale=scene_scale, dist_k=k_true)
        print(f"[soak] exact fisheye-match cache: {n_pairs} train pairs "
              f"(distorted pixel space, k_true={np.asarray(k_true).tolist()})",
              flush=True)

    t0 = time.perf_counter()
    exp = build_nerfpp_experiment(cfg, expdir)
    if not fisheye or fisheye_prd:
        assert exp.match_cache is not None and len(exp.match_cache.pairs()), \
            "PRD match cache empty — the PRD path would be vacuous"
        # Guard the GATING quantity, not just the cache: use_prd requires a
        # non-empty pair candidate list AND a cache hit for sampled pairs.
        assert exp.pair_list is not None and len(exp.pair_list), (
            "PRD pair list empty (pairing_angle_threshold too tight for "
            "this rig) — PRD steps would silently never dispatch")
        n_hit = sum(1 for i, j in exp.pair_list
                    if exp.match_cache.get(int(i), int(j)) is not None)
        assert n_hit > 0, "no pair-list pair has cached matches"
        print(f"[soak] PRD dispatch check: {len(exp.pair_list)} candidate "
              f"pairs, {n_hit} with matches", flush=True)

    curve = []

    def snapshot(step):
        ev = evaluate_nerfpp(exp, max_views=2)
        row = {"step": int(step),
               **{k: (float(v) if isinstance(v, (int, float, np.floating))
                      else v) for k, v in ev.items()}}
        if true_npz:
            row.update(scratch_camera_errors(exp, true_npz))
        curve.append(row)
        print(f"[soak] {json.dumps(row)}", flush=True)

    snapshot(0)
    for seg_end in (list(range(eval_every, n_steps + 1, eval_every))
                    + ([n_steps] if n_steps % eval_every else [])):
        run_nerfpp_training(cfg, expdir, n_steps=seg_end, exp=exp)
        snapshot(seg_end)
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

    ev = evaluate_nerfpp(exp, max_views=None)  # ALL held-out views
    quality = {
        "heldout_psnr_final": float(ev["psnr"]),
        "heldout_n_views": int(ev["n_views"]),
        "heldout_split": ev.get("split"),
        "psnr_gate_db": psnr_gate,
        "psnr_gate_pass": bool(ev["psnr"] > psnr_gate),
    }
    if true_npz:
        err0, errN = curve[0], scratch_camera_errors(exp, true_npz)
        quality["camera_err_initial"] = {
            k: err0[k] for k in ("rot_err_deg", "trans_err",
                                 "focal_rel_err", "k1_err", "k2_err")}
        quality["camera_err_final"] = errN
        # Split gates (round-5, VERDICT r4 weak #3): pose/focal recovery and
        # radial-k discovery fail for different reasons and are tracked
        # separately instead of one opaque AND.
        quality["pose_focal_gate_pass"] = bool(
            errN["rot_err_deg"] < err0["rot_err_deg"]
            and errN["trans_err"] < err0["trans_err"]
            and errN["focal_rel_err"] < 0.9 * err0["focal_rel_err"])
        # k gate: the discovered k1 must land within 25% of the true |k1|
        # (= the VERDICT's k1_err < 0.03 at the default true k1 = -0.12,
        # scale-invariant for the --strong_k scene).
        k1_true = abs(dist_k[0])
        quality["k_gate_k1_err_max"] = 0.25 * k1_true
        quality["k_gate_pass"] = bool(errN["k1_err"] < 0.25 * k1_true)
        if not quality["k_gate_pass"] and not fisheye_prd:
            # Photometric-only k discovery is timescale-bound at sub-pixel
            # distortion signal (the landscape is verified exact; the
            # reference's radial phase alone is 300k steps on captures with
            # ~10x larger distortion) — docs/calibration_convergence.md
            # round-4d. The supported from-scratch recipe is the
            # distortion-aware PRD (--fisheye_prd), gated un-waived.
            quality["k_gate_waived_reason"] = (
                "photometric-only k recovery is timescale-bound at this "
                "distortion scale (docs/calibration_convergence.md "
                "round-4d); the framework's from-scratch recipe is "
                "--fisheye_prd (distortion-aware PRD), which this gate "
                "tracks un-waived")
        quality["camera_gate_pass"] = bool(
            quality["pose_focal_gate_pass"] and quality["k_gate_pass"])
    report = {
        "n_steps": n_steps + extra,
        "fisheye": bool(fisheye),
        "from_scratch": bool(from_scratch),
        **({"injected": SCRATCH_NOISE,
            "true_k": list(dist_k), "k_init": [0.0, 0.0]}
           if from_scratch else {}),
        "n_rand": cfg.sampling.N_rand,
        "camera_lr_mult": camera_lr_mult,
        "distortion_lr_mult": distortion_lr_mult,
        "mult_until": mult_until,
        "add_radial_at": int(cfg.camera.add_radial) if fisheye else None,
        "add_ie_at": int(cfg.camera.add_ie),
        "add_od_at": int(cfg.camera.add_od),
        "fisheye_prd": bool(fisheye_prd),
        "wide_fov": bool(wide_fov),
        "strong_k": bool(strong_k),
        "sift_matches": bool(sift_matches),
        "n_train": int(n_train),
        **({"prd_weight": prd_weight, "prd_cadence": prd_cadence,
            "add_prd_at": int(cfg.camera.add_prd),
            "prd_anneal_until": int(cfg.camera.prd_anneal_until),
            "prd_weight_after": cfg.camera.ray_dist_loss_weight_after,
            "prd_cadence_after": int(cfg.camera.i_ray_dist_loss_after),
            } if fisheye_prd else {}),
        **({"n_match_pairs": len(exp.match_cache.pairs())}
           if exp.match_cache is not None else {}),
        "scene": "analytic 3-blob field (consistent 3D, scaled into the "
                 "unit fg sphere), black background",
        "train_rays_per_sec_incl_compile": round(
            n_steps * cfg.sampling.N_rand / total_dt, 1),
        "train_rays_per_sec_marginal": round(
            extra * cfg.sampling.N_rand / marginal_dt, 1),
        "final_metrics": final_metrics,
        "finite": bool(all(np.isfinite(v) for v in final_metrics.values())),
        "heldout_eval": {k: (float(v) if isinstance(v, (int, float, np.floating))
                             or (hasattr(v, "ndim") and v.ndim == 0) else v)
                         for k, v in ev.items()},
        "quality": quality,
        "eval_curve": curve,
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
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--psnr_gate", type=float, default=25.0)
    ap.add_argument("--fisheye", action="store_true",
                    help="soak the fisheye pipeline (distortion camera, "
                         "tied ray noise, multiplicative K)")
    ap.add_argument("--from_scratch", action="store_true",
                    help="fisheye SELF-CALIBRATION protocol (BASELINE "
                         "config 5): zero distortion init, 5%% focal + "
                         "1deg/0.02 pose corruption on the train split; "
                         "gates on recovering k/focal/pose")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS; this uses jax.config)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke of the soak mechanics)")
    ap.add_argument("--camera_lr_mult", type=float, default=1.0,
                    help="LR multiplier on the global calibration leaves "
                         "(docs/calibration_convergence.md round-4b)")
    ap.add_argument("--wide_fov", action="store_true",
                    help="k-observability scene variant (wider FOV + "
                         "bigger blobs -> content at high radius)")
    ap.add_argument("--distortion_lr_mult", type=float, default=1.0,
                    help="extra LR multiplier on distortion_noise only "
                         "(composes with --camera_lr_mult; round-4f)")
    ap.add_argument("--mult_until", type=int, default=0,
                    help="anneal BOTH multipliers to 1.0 after this step "
                         "(0 = hold)")
    ap.add_argument("--add_radial_step", type=int, default=-1,
                    help="override the staged-curriculum add_radial step "
                         "(-1 = published 8N/15 proportion)")
    ap.add_argument("--add_ie_step", type=int, default=-1,
                    help="override the staged-curriculum add_ie step "
                         "(-1 = published N/3 proportion)")
    ap.add_argument("--fisheye_prd", action="store_true",
                    help="enable distortion-aware PRD on the fisheye run "
                         "(exact matches in distorted pixel space; the "
                         "from-scratch k-recovery recipe)")
    ap.add_argument("--add_od_step", type=int, default=-1,
                    help="override the staged-curriculum add_od step "
                         "(-1 = published 11N/15 proportion; round-4f leg A "
                         "showed OD unfreeze destabilizing a mult-16 k)")
    ap.add_argument("--strong_k", action="store_true",
                    help="real-fisheye distortion scale (true k1 = -0.35 "
                         "vs the default -0.12)")
    ap.add_argument("--sift_matches", action="store_true",
                    help="PRD matches from the real SIFT provider on the "
                         "rendered (textured) images instead of exact "
                         "projections — the full production matcher path")
    ap.add_argument("--n_train", type=int, default=8,
                    help="train views on the camera ring (SIFT legs want "
                         "a denser ring, e.g. 16)")
    ap.add_argument("--prd_weight", type=float, default=1e-4,
                    help="PRD loss weight on the fisheye_prd runs")
    ap.add_argument("--add_prd_step", type=int, default=-1,
                    help="decouple PRD from add_radial: open PRD at this step "
                         "(leg-I camera-first protocol)")
    ap.add_argument("--prd_until", type=int, default=0,
                    help="end the PRD calibration phase at this step: "
                         "weight/cadence return to the published protocol "
                         "(1e-4, every 10); pair with --mult_until")
    ap.add_argument("--prd_cadence", type=int, default=10,
                    help="PRD step cadence on the fisheye_prd runs")
    ap.add_argument("--hires", action="store_true",
                    help="240x320 images (SIFT legs: keypoint density "
                         "needs the resolution; step cost is N_rand-bound)")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from _watchdog import supervise

        supervise()  # axon wedge guard: respawn until "[preflight]" appears
    main(a.steps, a.out, a.workdir, fisheye=a.fisheye,
         eval_every=a.eval_every, psnr_gate=a.psnr_gate,
         from_scratch=a.from_scratch, small=a.small,
         camera_lr_mult=a.camera_lr_mult, wide_fov=a.wide_fov,
         distortion_lr_mult=a.distortion_lr_mult, mult_until=a.mult_until,
         add_radial_step=a.add_radial_step, add_ie_step=a.add_ie_step,
         fisheye_prd=a.fisheye_prd, add_od_step=a.add_od_step,
         strong_k=a.strong_k, sift_matches=a.sift_matches,
         n_train=a.n_train, prd_weight=a.prd_weight,
         prd_cadence=a.prd_cadence, hires=a.hires,
         add_prd_step=a.add_prd_step, prd_until=a.prd_until)
