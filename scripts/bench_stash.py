"""A/B: bf16 remat-stash on the NeRF train step (round-2 VERDICT item 4).

The fern-shape step is HBM-bound; one untried lever was casting the
checkpoint-boundary residuals of ``query_field_chunked`` to bf16
(``RenderConfig.remat_stash_bf16``). This measures rays/s for both
settings on the SAME workload as ``bench.py`` plus the per-step FLOPs /
HBM bytes from XLA cost analysis, and the numerical deviation of one
step's loss. Result lands in docs/perf_nerf.md.

Usage (TPU, serialize with other axon clients): python scripts/bench_stash.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(stash: bool, iters: int = 50):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    model_cfg, render_cfg, params = _flagship()
    render_cfg = render_cfg.replace(remat_stash_bf16=stash)
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0, far=6.0)
    tx = make_optimizer(5e-4, 250e3, weight_decay=0.1, params_example=params)
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx,
                           donate=False)

    n_rand = 1024
    rng = np.random.RandomState(0)
    batch = {
        "px": jnp.asarray(rng.randint(0, 1008, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, 756, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(rng.randint(0, 8, n_rand)),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
    }
    key = jax.random.key(0)
    compiled = step.lower(state, batch, key).compile()
    st, m0 = compiled(state, batch, key)
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    for i in range(iters):
        st, m = compiled(st, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(st.params)
    dt = (time.perf_counter() - t0) / iters
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "stash_bf16": stash,
        "rays_per_sec": round(n_rand / dt, 1),
        "step_ms": round(dt * 1e3, 3),
        "flops_per_step": float(ca.get("flops", 0.0)),
        "hbm_bytes_per_step": float(ca.get("bytes accessed", 0.0)),
        "first_step_loss": float(m0["loss"]),
    }


def main():
    import jax
    import jax.numpy as jnp

    (jnp.arange(4.0) @ jnp.ones((4,))).block_until_ready()  # axon preflight
    print(f"[bench_stash] backend={jax.default_backend()}", flush=True)
    a = measure(False)
    b = measure(True)
    rel = b["rays_per_sec"] / a["rays_per_sec"] - 1.0
    report = {
        "baseline": a, "stash_bf16": b,
        "rays_per_sec_change": round(rel, 4),
        "hbm_bytes_change": round(
            b["hbm_bytes_per_step"] / max(a["hbm_bytes_per_step"], 1) - 1.0, 4),
        "loss_rel_dev": abs(b["first_step_loss"] - a["first_step_loss"])
        / max(abs(a["first_step_loss"]), 1e-12),
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
