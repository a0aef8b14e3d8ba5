"""A/B the remaining r3c perf levers on the real chip at bench shapes.

The xprof trace (docs/perf_nerf.md) says the fern train step is
compute-bound at ~53% MFU, with ~25% of step FLOPs in remat recompute and
a ~0.75 ms/step host-dispatch gap (9.0 ms device vs 9.75 ms wall). The
levers that could still move it, measured here head-to-head:

  1. ``prevent_cse=False`` on the sample-chunk ``jax.checkpoint`` — safe
     under ``lax.scan`` (jax docs: scan/cond bodies do not CSE across the
     boundary) and gives XLA more scheduling freedom on the recompute.
  2. ``remat_chunk`` retune {8, 16, 32} at the production shapes (16 was
     tuned in isolation in round 1; shapes have since changed).
  3. ``jax.checkpoint_policies.dots_saveable`` — stash matmul outputs
     instead of recomputing them (trades the 25% FLOP recompute for HBM
     traffic, which sits at 10% util).
  4. fused multi-step dispatch: K train steps per ``jit`` call via
     ``lax.scan`` over device-sampled batches, amortizing the host gap.

Usage:  python scripts/ab_step_levers.py [--iters 40]
Prints one ms/step + rays/s line per variant.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(render_overrides=None, checkpoint_wrap=None):
    """Bench workload (fern shapes, full camera) with optional RenderConfig
    field overrides and an optional ``jax.checkpoint`` replacement active
    during trace time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    model_cfg, render_cfg, params = _flagship()
    if render_overrides:
        render_cfg = render_cfg.replace(**render_overrides)
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0, far=6.0)
    tx = make_optimizer(5e-4, 250e3, weight_decay=0.1, params_example=params)
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx)
    rng = np.random.RandomState(0)
    n_rand = 1024
    batch = {
        "px": jnp.asarray(rng.randint(0, 1008, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, 756, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(rng.randint(0, 8, n_rand)),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
    }
    key = jax.random.key(0)
    if checkpoint_wrap is not None:
        orig = jax.checkpoint
        jax.checkpoint = checkpoint_wrap(orig)
        try:
            compiled = step.lower(state, batch, key).compile()
        finally:
            jax.checkpoint = orig
    else:
        compiled = step.lower(state, batch, key).compile()
    return compiled, state, batch, key, n_rand


def time_step(compiled, state, batch, key, n_rand, iters):
    import jax

    state, _ = compiled(state, batch, key)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = compiled(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    return dt, n_rand / dt


def multistep_variant(k_steps: int, iters: int):
    """K fused steps per dispatch with on-device sampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.device_sampling import make_device_sampling_step
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    model_cfg, render_cfg, params = _flagship()
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0, far=6.0)
    tx = make_optimizer(5e-4, 250e3, weight_decay=0.1, params_example=params)
    state = create_train_state(params, tx)
    base = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx,
                           donate=False)
    images = jnp.asarray(np.random.RandomState(1).rand(8, 756, 1008, 3),
                         jnp.float32)
    n_rand = 1024
    step = make_device_sampling_step(base, images, n_rand,
                                     steps_per_call=k_steps)
    key = jax.random.key(0)
    if k_steps == 1:
        state, _ = step(state, key)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for i in range(iters):
            state, _ = step(state, jax.random.fold_in(key, i))
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters
    else:
        outer = max(1, iters // k_steps)
        state, _ = step(state, key, 0)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for i in range(outer):
            state, _ = step(state, key, 1 + i * k_steps)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / (outer * k_steps)
    return dt, n_rand / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--only", choices=["config", "multistep"], default=None,
                    help="run one lever family (each compile is ~60s; a "
                    "bounded run may need to split)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    x = jnp.arange(4.0) @ jnp.ones((4,))
    jax.block_until_ready(x)
    print("[preflight] ok, backend =", jax.default_backend(), flush=True)

    results = {}

    def run(name, **kw):
        compiled, state, batch, key, n_rand = build_step(**kw)
        dt, rays = time_step(compiled, state, batch, key, n_rand, args.iters)
        results[name] = (dt, rays)
        print(f"{name:34s} {dt*1e3:7.2f} ms/step  {rays/1e3:7.1f}k rays/s",
              flush=True)

    if args.only in (None, "config"):
        run("base (chunk16, prevent_cse=T)")
        run("prevent_cse=False", checkpoint_wrap=lambda orig: (
            lambda f, **kw: orig(f, prevent_cse=False, **kw)))
        run("chunk8", render_overrides={"remat_chunk": 8})
        run("chunk32", render_overrides={"remat_chunk": 32})
        run("policy=dots_saveable", checkpoint_wrap=lambda orig: (
            lambda f, **kw: orig(
                f, policy=jax.checkpoint_policies.dots_saveable,
                **{k: v for k, v in kw.items() if k != "policy"})))

    if args.only in (None, "multistep"):
        for k in (1, 10):
            dt, rays = multistep_variant(k, args.iters)
            results[f"device-sampled K={k}"] = (dt, rays)
            print(f"{f'device-sampled K={k}':34s} {dt*1e3:7.2f} ms/step  "
                  f"{rays/1e3:7.1f}k rays/s", flush=True)

    base = next(iter(results.values()))[0]
    print("\n== vs first row ==")
    for name, (dt, _) in results.items():
        print(f"  {name:34s} {base/dt:6.3f}x")


if __name__ == "__main__":
    main()
