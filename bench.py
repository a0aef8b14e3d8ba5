"""Headline benchmark: train+render rays/sec/chip at the LLFF-fern workload.

Workload (BASELINE.md throughput denominators): N_rand=1024 rays/step,
64 coarse + 64 fine samples, 8x256 MLP with viewdirs, full generic camera
(learnable K/E + rayo/rayd noise grids) and joint backward through the
camera — i.e. the reference's ``demo.sh`` hot loop.

Baseline: the reference publishes no throughput tables; from the upstream
nerf-pytorch claim (lego 100k iters ~ 4h on one RTX 2080 Ti at N_rand=1024
-> ~7.1k rays/s) scaled by a typical V100/2080Ti NeRF ratio (~1.4x), the
V100 per-chip train throughput is ~10k rays/s. BASELINE.json's target is
>=2x V100 per chip, so ``vs_baseline`` reported here is (measured / 10_000)
— the value to beat is 2.0.

Prints ONE json line.
"""
import json
import time

import numpy as np


V100_RAYS_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from scnerf_tpu.render.renderer import render_chunked
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    model_cfg, render_cfg, params = _flagship()
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0, far=6.0)
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

    # Warmup/compile.
    state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    train_dt = (time.perf_counter() - t0) / iters
    train_rays = N_RAND / train_dt

    # Render throughput: one 8192-chunked forward over 65536 rays.
    eval_cfg = render_cfg.eval_mode()
    n_render = 65536
    px = jnp.asarray(rng.randint(0, 1008, n_render).astype(np.float32))
    py = jnp.asarray(rng.randint(0, 756, n_render).astype(np.float32))
    from scnerf_tpu.camera.rays import pixels_to_rays

    @jax.jit
    def render(params, px, py, key):
        rays_o, rays_d = pixels_to_rays(params["camera"], px, py,
                                        image_idx=jnp.zeros_like(px, jnp.int32))
        vd = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
        return render_chunked(params, model_cfg, eval_cfg, rays_o, rays_d, vd,
                              2.0, 6.0, key)["rgb"]

    out = render(state.params, px, py, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = render(state.params, px, py, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    render_dt = (time.perf_counter() - t0) / 3
    render_rays = n_render / render_dt

    # Headline: harmonic-style combined figure dominated by train (the hot
    # path); report both components in extras.
    value = train_rays
    print(
        json.dumps(
            {
                "metric": "train rays/sec/chip (LLFF-fern workload, full camera)",
                "value": round(value, 1),
                "unit": "rays/s",
                "vs_baseline": round(value / V100_RAYS_PER_SEC, 3),
                "extras": {
                    "render_rays_per_sec": round(render_rays, 1),
                    "train_step_ms": round(train_dt * 1e3, 2),
                    "baseline_v100_rays_per_sec": V100_RAYS_PER_SEC,
                    "target_vs_baseline": 2.0,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
