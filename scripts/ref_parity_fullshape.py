"""FULL-compute-shape trajectory parity vs the torch reference.

Round-2 VERDICT item 1: the 17-regime evidence matrix runs at toy shapes
(24x32, width-64, 12+12 samples); chunking, the remat-chunk-16 boundary,
the Pallas-pdf padded shapes and f32 accumulation depth all behave
differently at the published shapes. This driver re-runs the two highest-
value regimes at the REAL fern compute shape:

  N_rand=1024, width-256 depth-8 (skips at 4), multires 10/4,
  64 coarse + 64 fine samples, chunk=32768 / netchunk=65536 (the
  reference's production flags, already what ``run_reference`` passes),
  remat_chunk=16 (our production default) — at 192x256 images (ray count
  per step and per-sample compute are resolution-independent; 192x256
  keeps the torch-cpu reference's memory and the pixel-pool divisibility
  clean: 2 train images * 192*256 / 1024 = 96 steps/epoch, so an epoch
  reshuffle IS exercised within 100 steps).

Regimes:
  fern   --batching --ndc  (+ camera implied): the EXACT published fern
         default flag set (``NeRF/configs/llff_data/fern.txt``), pixel
         pool + NDC + learnable camera.
  fullnoise                the TRUE stochastic training semantics:
         perturb=1, raw_noise_std=1, non-deterministic inverse-CDF with
         the torch stream replayed and injected — at N_rand=1024 < H*W,
         replaying the no-replacement pixel draw itself.

The torch-cpu reference runs ~20-25 s/step at this shape
(``REF_BASELINE.json``), so each regime costs ~30-40 min reference time;
run via background Bash and keep the TPU free (this is all-CPU).

Usage:
  python scripts/ref_parity_fullshape.py --regime fern      [--steps 80]
  python scripts/ref_parity_fullshape.py --regime fullnoise [--steps 80]
  python scripts/ref_parity_fullshape.py --regime all
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts import ref_parity as rp


def configure_fullshape():
    """Mutate ref_parity's module-level workload to the fern compute shape."""
    rp.H, rp.W, rp.FOCAL = 192, 256, 224.0
    rp.MLP = dict(depth=8, width=256, skips=(4,), multires=10,
                  multires_views=4)
    rp.SAMPLES = dict(n_samples=64, n_importance=64)
    rp.N_RAND_BATCHING = 1024
    rp.N_RAND_FULLNOISE = 1024
    rp.REF_TIMEOUT = 14400


REGIMES = {
    # name -> (main() kwargs, artifact)
    "fern": (dict(batching=True, ndc=True), "PARITY_TRAJ_FULLSHAPE_FERN.json"),
    "fullnoise": (dict(fullnoise=True), "PARITY_TRAJ_FULLSHAPE_FULLNOISE.json"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=[*REGIMES, "all"], default="all")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--outdir", type=str, default=REPO)
    a = ap.parse_args()

    configure_fullshape()
    names = list(REGIMES) if a.regime == "all" else [a.regime]
    for name in names:
        kwargs, artifact = REGIMES[name]
        print(f"[fullshape] regime={name} steps={a.steps} "
              f"H={rp.H} W={rp.W} width={rp.MLP['width']} "
              f"samples={rp.SAMPLES}", flush=True)
        rp.main(a.steps, os.path.join(a.outdir, artifact), **kwargs)
        # main() resets N_IMAGES/TEXTURE but not the shape overrides;
        # nothing else mutates them, so no re-configure needed.


if __name__ == "__main__":
    main()
