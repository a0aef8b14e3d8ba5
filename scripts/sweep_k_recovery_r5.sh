#!/usr/bin/env bash
# Round-5 from-scratch radial-k recovery sweep (BASELINE config 5;
# round-4 VERDICT items 1 and 6).
#
# Serialized TPU legs. Leg E is the framework's recommended from-scratch
# recipe (distortion-aware PRD on matches in distorted pixel space) run at
# soak grade; legs B/C/D complete the round-4f photometric sweep (leg A ran
# in r4 and diverged at the OD unfreeze); leg F escalates to real-fisheye
# distortion scale (|k1|=0.35) with OD deferred past the annealed
# calibration phase.
#
# Usage: bash scripts/sweep_k_recovery_r5.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/artifacts
export WATCHDOG_ATTEMPTS=${WATCHDOG_ATTEMPTS:-12}
export WATCHDOG_GRACE_S=${WATCHDOG_GRACE_S:-300}

run_leg() { # name steps extra-args...
  local name=$1 steps=$2; shift 2
  echo "=== leg $name ($steps steps): $* [$(date +%H:%M:%S)]"
  timeout 5400 python scripts/soak_nerfpp.py --fisheye --from_scratch \
    --steps "$steps" --eval_every 500 \
    --out "docs/artifacts/K_${name}.json" "$@" \
    > "/tmp/k_leg_${name}.log" 2>&1
  echo "=== leg $name rc=$? [$(date +%H:%M:%S)]"
  python - "docs/artifacts/K_${name}.json" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception as e:
    print("  (no artifact)", e); raise SystemExit
q = d["quality"]
print("  heldout", round(q["heldout_psnr_final"], 2), "dB;",
      "k_learned", [round(x, 4) for x in q["camera_err_final"].get("k_learned", [])],
      "k1_err", round(q["camera_err_final"]["k1_err"], 4),
      "focal", round(q["camera_err_final"]["focal_rel_err"], 4),
      "rot", round(q["camera_err_final"]["rot_err_deg"], 3),
      "k_gate", q.get("k_gate_pass"), "pf_gate", q.get("pose_focal_gate_pass"))
EOF
}

# E: the distortion-aware-PRD from-scratch recipe at soak grade (exact
#    matches in DISTORTED pixel space through the production provider path).
run_leg E_prd_wide 10000 --wide_fov --fisheye_prd \
  --camera_lr_mult 8 --distortion_lr_mult 4 --mult_until 8000
# B: gentler photometric k mult (eff 32) — r4f sweep leg B
run_leg B_wide_d4 10000 --wide_fov --camera_lr_mult 8 --distortion_lr_mult 4 --mult_until 8000
# D: radial unfrozen WITH ie (before the field entrenches k=0) — r4f leg D
run_leg D_wide_earlyradial 10000 --wide_fov --camera_lr_mult 8 \
  --distortion_lr_mult 16 --mult_until 8000 --add_radial_step 3334
# C: default-scene geometry with the stronger mult — r4f leg C
run_leg C_default_d16 10000 --camera_lr_mult 8 --distortion_lr_mult 16 --mult_until 8000
# F: real-fisheye distortion scale (|k1|=0.35, super-pixel signal), OD
#    deferred past the annealed phase (leg A diverged at the OD unfreeze)
run_leg F_strongk_odlate 12000 --wide_fov --strong_k --camera_lr_mult 8 \
  --distortion_lr_mult 8 --mult_until 9000 --add_od_step 9500
echo "=== sweep done [$(date +%H:%M:%S)]"
