#!/usr/bin/env bash
# Round-4f from-scratch radial-k recovery sweep (BASELINE config 5).
#
# Runs serialized TPU legs of scripts/soak_nerfpp.py --from_scratch with the
# distortion_lrate_mult extension. Each leg writes docs/artifacts/K_<name>.json.
# Serialize with any other TPU job (CLAUDE.md: never two axon clients at once).
#
# Usage: bash scripts/sweep_k_recovery.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/artifacts
export WATCHDOG_ATTEMPTS=${WATCHDOG_ATTEMPTS:-10}
export WATCHDOG_GRACE_S=${WATCHDOG_GRACE_S:-240}

run_leg() { # name steps extra-args...
  local name=$1 steps=$2; shift 2
  echo "=== leg $name ($steps steps): $*"
  timeout 3000 python scripts/soak_nerfpp.py --fisheye --from_scratch \
    --steps "$steps" --eval_every 500 \
    --out "docs/artifacts/K_${name}.json" "$@" \
    > "/tmp/k_leg_${name}.log" 2>&1
  echo "=== leg $name rc=$?"
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
      "gate", q.get("camera_gate_pass"))
EOF
}

# A: published staged curriculum + calibration-phase mults (k eff 128)
run_leg A_wide_d16 10000 --wide_fov --camera_lr_mult 8 --distortion_lr_mult 16 --mult_until 8000
# B: gentler k mult (k eff 32)
run_leg B_wide_d4 10000 --wide_fov --camera_lr_mult 8 --distortion_lr_mult 4 --mult_until 8000
# C: default-scene geometry (0.19 px median signal) with the stronger mult
run_leg C_default_d16 10000 --camera_lr_mult 8 --distortion_lr_mult 16 --mult_until 8000
# D: radial unfrozen WITH ie (before the field entrenches k=0), od stays late
run_leg D_wide_earlyradial 10000 --wide_fov --camera_lr_mult 8 --distortion_lr_mult 16 --mult_until 8000 --add_radial_step 3334
echo "=== sweep done"
