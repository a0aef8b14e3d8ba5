"""Pin the r2->r4 headline-bench drift (round-4 VERDICT weak #5).

Hypothesis under test: the drift (105.1k r2 -> 100.6k r3 -> 97.1k r4
rays/s) is axon-tunnel RPC weather, not a step regression — r4's bench
recorded device_roundtrip_ms = 33.5 (healthy ~0.1 ms), and every timed
rep pays one RTT on its final block_until_ready.

Method: time the SAME compiled fused-scan executable at two fuse depths
(k=25, the bench default, and k=100) and difference them — the marginal
rate (75 extra steps / extra time) cancels the per-dispatch RTT exactly,
measuring pure device step time. If marginal ~= the r2/r3 numbers while
the k=25 rate shows the familiar drift, the drift is attributable to the
tunnel, not the code.

Usage: python scripts/diag_bench_drift.py [--out docs/artifacts/BENCH_DRIFT.json]
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


def measure(k_values=(25, 100), reps: int = 5):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import (TrainConfig, create_train_state,
                                       make_train_step)

    v = (jnp.arange(4.0) @ jnp.ones((4,))).block_until_ready()
    print(f"[preflight] backend={jax.default_backend()} ok ({float(v)})",
          flush=True)

    model_cfg, render_cfg, params = _flagship()
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0,
                            far=6.0)
    tx = make_optimizer(5e-4, 250e3, weight_decay=0.1, params_example=params)
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx)

    N_RAND = 1024
    rng = np.random.RandomState(0)
    batch = {
        "px": jnp.asarray(rng.randint(0, 1008, N_RAND).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, 756, N_RAND).astype(np.float32)),
        "img_idx": jnp.asarray(rng.randint(0, 8, N_RAND)),
        "target": jnp.asarray(rng.rand(N_RAND, 3).astype(np.float32)),
    }
    key = jax.random.key(0)

    # RTT probe (same as bench.py's device_roundtrip_ms).
    one = jnp.ones(())
    f = jax.jit(lambda x: x + 1.0)
    f(one).block_until_ready()
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        f(one).block_until_ready()
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts)) * 1e3

    results = {}
    for k_fuse in k_values:
        def run(s, k, _kf=k_fuse):
            def body(ss, i):
                return step(ss, batch, jax.random.fold_in(k, i))[0], None

            return lax.scan(body, s, jnp.arange(_kf))[0]

        fused = jax.jit(run)
        s = fused(state, key)
        jax.block_until_ready(s)
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            s = fused(s, jax.random.fold_in(key, 10_000 + r))
            jax.block_until_ready(s)
            best = min(best, time.perf_counter() - t0)
        results[k_fuse] = best
        print(f"[drift] k_fuse={k_fuse}: best rep {best*1e3:.2f} ms -> "
              f"{N_RAND * k_fuse / best:.1f} rays/s", flush=True)

    ks = sorted(results)
    k0, k1 = ks[0], ks[-1]
    marginal_step_s = (results[k1] - results[k0]) / (k1 - k0)
    report = {
        "device_roundtrip_ms": round(rtt_ms, 3),
        "rates_rays_per_sec": {
            str(k): round(N_RAND * k / t, 1) for k, t in results.items()},
        "marginal_step_ms": round(marginal_step_s * 1e3, 3),
        "marginal_rays_per_sec": round(N_RAND / marginal_step_s, 1),
        "per_rep_overhead_ms": round(
            (results[k0] - marginal_step_s * k0) * 1e3, 2),
        "history": {"r2": 105137.9, "r3": 100603.6, "r4": 97074.6},
        "note": "marginal rate differences k=100 vs k=25 fused scans; "
                "cancels the per-dispatch tunnel RTT.",
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from _watchdog import supervise

    supervise()
    r = measure()
    if a.out:
        json.dump(r, open(a.out, "w"), indent=2)
