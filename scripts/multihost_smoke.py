"""Multi-HOST (multi-process) training smoke on a CPU-emulated 2-host setup.

The reference bootstraps real multi-process DDP over gloo
(``/root/reference/nerfplusplus/ddp_train_nerf.py:296-302``); our analogue is
``distributed/init.py:initialize_runtime`` + a global ``jax.sharding.Mesh``.
Until now that path only had SINGLE-process evidence (one process, 8 virtual
devices). This script launches TWO actual OS processes, each owning 4 virtual
CPU devices, joined through a TCP coordinator into one 8-device global mesh —
JAX's cross-process collectives (gloo on CPU, DCN on a real pod) carry the
gradient reductions, exactly the code path a multi-host TPU pod uses.

Checks (written to MULTIHOST_SMOKE.json, one entry per pipeline — the
NeRF camera+coarse/fine step AND the NeRF++ camera+fg/bg cascade step,
the pipeline whose reference actually runs multi-process DDP):
  - topology: process_count=2, global_devices=8, local_devices=4 each;
  - 40 sharded training steps of the full train step, batch sharded
    over the data axis ACROSS processes (each holds only its half);
  - a mid-run checkpoint cycle: coordinator-only save (the reference's
    rank-0 gate, ``ddp_train_nerf.py:603-617``), barrier, all-process
    restore, training continues;
  - the per-step loss trajectory and final params match a single-process
    8-device run to f32 reduction tolerance.

Usage: python scripts/multihost_smoke.py [--steps 40] [--out MULTIHOST_SMOKE.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 4


def _force_cpu(n_dev: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _build_problem(pipeline: str):
    """A small full train-step problem for the given pipeline.

    Same RNG seed on every process -> identical initial state and batch
    (the reference broadcasts params from rank 0; seed-identical init is
    the jax idiom for the same invariant).

    - ``nerf``: full camera + coarse/fine NeRF step (tests.test_train).
    - ``nerfpp``: full camera + fg/bg cascade NeRF++ step — the pipeline
      whose reference actually runs multi-process DDP
      (``ddp_train_nerf.py:296-302``), so multi-process evidence matters
      most here (tests.test_nerfpp).
    """
    sys.path.insert(0, REPO)
    if pipeline == "nerfpp":
        from tests.test_nerfpp import TestNerfPPTraining

        return TestNerfPPTraining().build()
    from tests.test_train import build

    return build()


def run_child(proc_id: int, port: int, steps: int, ckpt_dir: str, out_json: str,
              pipeline: str = "nerf"):
    jax = _force_cpu(DEV_PER_PROC)
    import numpy as np

    sys.path.insert(0, REPO)
    from scnerf_tpu.distributed.init import initialize_runtime, is_coordinator
    from scnerf_tpu.distributed.mesh import make_mesh, replicated, data_sharded
    from scnerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    info = initialize_runtime(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    assert info["process_count"] == N_PROC, info
    assert info["global_devices"] == N_PROC * DEV_PER_PROC, info
    from jax.experimental import multihost_utils

    state, step, batch = _build_problem(pipeline)
    mesh = make_mesh()  # 8 global devices, data axis across both processes
    rep = replicated(mesh)
    shard = data_sharded(mesh)

    # Replicate state (identical on all processes) onto the global mesh.
    state = jax.device_put(state, rep)

    # Shard the ray batch across processes: each process feeds ONLY its
    # local half, jax stitches the global array (the multi-host data path).
    n = int(np.asarray(batch["px"]).shape[0])
    half = n // N_PROC
    lo, hi = proc_id * half, (proc_id + 1) * half

    def to_global(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] < n:  # scalars/metadata replicate
            return jax.device_put(x, rep)
        local = x[lo:hi]
        return jax.make_array_from_process_local_data(shard, local, x.shape)

    gbatch = {k: to_global(v) for k, v in batch.items()}

    key = jax.random.key(7)
    losses = []
    ckpt_step = steps // 2
    for i in range(steps):
        if i == ckpt_step:
            # NOTE: orbax ``save`` is a COLLECTIVE — every process must call
            # it (orbax gates the actual writes to the primary host
            # internally, which is the reference's rank-0 semantics); a
            # coordinator-only call deadlocks against orbax's internal
            # barriers. Then every process restores and resumes from disk.
            save_checkpoint(ckpt_dir, state)
            multihost_utils.sync_global_devices("ckpt_saved")
            restored = restore_checkpoint(ckpt_dir, state)
            assert restored is not None
            state = jax.device_put(restored, rep)
        state, metrics = step(state, gbatch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))

    final_params = jax.device_get(state.params)
    multihost_utils.sync_global_devices("done")
    if is_coordinator():
        flat = {
            str(path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(final_params)[0]
        }
        np.savez(out_json + ".params.npz", **flat)
        with open(out_json, "w") as f:
            json.dump({"topology": info, "losses": losses,
                       "ckpt_cycle_at": ckpt_step}, f)
    jax.distributed.shutdown()


def run_single(steps: int, out_json: str, pipeline: str = "nerf"):
    """Single-process 8-device reference trajectory (the baseline)."""
    jax = _force_cpu(N_PROC * DEV_PER_PROC)
    import numpy as np

    sys.path.insert(0, REPO)
    from scnerf_tpu.distributed.mesh import make_mesh, replicated, shard_batch

    state, step, batch = _build_problem(pipeline)
    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    gbatch = shard_batch(mesh, batch)
    key = jax.random.key(7)
    losses = []
    for i in range(steps):
        state, metrics = step(state, gbatch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    flat = {
        str(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            jax.device_get(state.params))[0]
    }
    np.savez(out_json + ".params.npz", **flat)
    with open(out_json, "w") as f:
        json.dump({"losses": losses}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--port", type=int, default=29517)
    ap.add_argument("--pipelines", default="nerf,nerfpp",
                    help="comma list: nerf,nerfpp")
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_SMOKE.json"))
    args = ap.parse_args()
    import numpy as np

    report = {"pipelines": {}}
    ok_all = True
    for pidx, pipeline in enumerate(args.pipelines.split(",")):
        with tempfile.TemporaryDirectory() as tmp:
            mh_json = os.path.join(tmp, "mh.json")
            sp_json = os.path.join(tmp, "sp.json")
            ckpt_dir = os.path.join(tmp, "ckpt")

            env = dict(os.environ)
            port = args.port + pidx  # fresh coordinator port per pipeline
            procs = [
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__), "--_child",
                     str(i), str(port), str(args.steps), ckpt_dir, mh_json,
                     pipeline],
                    env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True,
                )
                for i in range(N_PROC)
            ]
            outs = []
            ok = True
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out)
                ok = ok and p.returncode == 0
            if not ok:
                for i, o in enumerate(outs):
                    sys.stderr.write(f"--- {pipeline} child {i} ---\n{o[-4000:]}\n")
                raise SystemExit(f"multi-process run failed ({pipeline})")

            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_single",
                 str(args.steps), sp_json, pipeline],
                env=env, capture_output=True, text=True, timeout=900,
            )
            if r.returncode != 0:
                sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
                raise SystemExit(f"single-process run failed ({pipeline})")

            mh = json.load(open(mh_json))
            sp = json.load(open(sp_json))
            mh_p = np.load(mh_json + ".params.npz")
            sp_p = np.load(sp_json + ".params.npz")
            loss_diff = float(np.max(np.abs(
                np.asarray(mh["losses"]) - np.asarray(sp["losses"]))))
            rel = loss_diff / max(1e-12, float(np.max(np.abs(sp["losses"]))))
            param_diff = max(
                float(np.max(np.abs(mh_p[k].astype(np.float64) - sp_p[k])))
                if mh_p[k].size else 0.0
                for k in sp_p.files
            )
            # Params are reported but gated loosely: on leaves whose true
            # gradient is ~0 (unused noise-grid cells, saturated units),
            # Adam normalizes the f32 reduction-order noise to a full
            # lr-scale step (m/sqrt(v) ~ 1 for pure-noise gradients), so
            # per-leaf drift up to ~lr*steps is expected WITHOUT any real
            # divergence — the measured NeRF++ leg sits at 4e-3 abs
            # (lr 5e-3, 40 steps) while its loss curves agree to 3e-6 rel.
            # Genuine collective bugs (wrong psum, missed sync) blow the
            # tight loss-trajectory gate immediately, which stays primary.
            param_rel = max(
                float(np.max(np.abs(mh_p[k].astype(np.float64) - sp_p[k]))
                      / (np.max(np.abs(sp_p[k].astype(np.float64))) + 1e-8))
                if mh_p[k].size else 0.0
                for k in sp_p.files
            )
            entry = {
                "topology": mh["topology"],
                "steps": args.steps,
                "ckpt_cycle_at": mh["ckpt_cycle_at"],
                "loss_first": sp["losses"][0],
                "loss_last_single": sp["losses"][-1],
                "loss_last_multihost": mh["losses"][-1],
                "max_abs_loss_diff": loss_diff,
                "max_rel_loss_diff": rel,
                "max_abs_param_diff": param_diff,
                "max_rel_param_diff": param_rel,
                "ok": bool(rel < 1e-4 and param_rel < 5e-2
                           and mh["losses"][-1] < mh["losses"][0] * 0.8),
            }
            report["pipelines"][pipeline] = entry
            ok_all = ok_all and entry["ok"]
    report["ok"] = ok_all
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    if not ok_all:
        raise SystemExit("multihost smoke FAILED")


if __name__ == "__main__":
    if "--_child" in sys.argv:
        i = sys.argv.index("--_child")
        run_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                  int(sys.argv[i + 3]), sys.argv[i + 4], sys.argv[i + 5],
                  sys.argv[i + 6] if len(sys.argv) > i + 6 else "nerf")
    elif "--_single" in sys.argv:
        i = sys.argv.index("--_single")
        run_single(int(sys.argv[i + 1]), sys.argv[i + 2],
                   sys.argv[i + 3] if len(sys.argv) > i + 3 else "nerf")
    else:
        main()
