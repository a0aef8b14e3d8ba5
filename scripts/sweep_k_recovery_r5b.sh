#!/usr/bin/env bash
# Round-5b k-recovery queue, reordered after legs A (r4) and E measured the
# failure mechanism: k is thrown wrong-sign by the OD-unfreeze transient
# (k1 -0.01 -> +0.23 within 400 steps of add_od, both legs), and the
# default-strength PRD restores it ~30x too slowly (1.8e-5 units/step).
#
# G: the pass candidate — distortion-aware PRD strengthened (3e-4 weight,
#    cadence 1), radial+PRD unfrozen early (3334), OD deferred entirely.
# F: photometric-only at real-fisheye distortion (|k1|=0.35), OD deferred
#    past the annealed phase — tests whether photometric alone recovers k
#    when the signal is super-pixel and the transient is avoided.
# D: early-radial diagnosis leg (r4f design) — how fast does photometric k
#    move in a long radial-only window at mult 16?
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/artifacts
export WATCHDOG_ATTEMPTS=${WATCHDOG_ATTEMPTS:-12}
export WATCHDOG_GRACE_S=${WATCHDOG_GRACE_S:-300}

run_leg() { # name steps extra-args...
  local name=$1 steps=$2; shift 2
  echo "=== leg $name ($steps steps): $* [$(date +%H:%M:%S)]"
  timeout 9000 python scripts/soak_nerfpp.py --fisheye --from_scratch \
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

run_leg G_prd_strong 15000 --wide_fov --fisheye_prd \
  --camera_lr_mult 8 --distortion_lr_mult 4 --mult_until 8000 \
  --add_radial_step 3334 --add_od_step 100000000 \
  --prd_weight 3e-4 --prd_cadence 1
run_leg F_strongk_odlate 12000 --wide_fov --strong_k --camera_lr_mult 8 \
  --distortion_lr_mult 8 --mult_until 9000 --add_od_step 9500
run_leg D_wide_earlyradial 10000 --wide_fov --camera_lr_mult 8 \
  --distortion_lr_mult 16 --mult_until 8000 --add_radial_step 3334
echo "=== r5b queue done [$(date +%H:%M:%S)]"
