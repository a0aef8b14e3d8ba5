"""A/B the fused fg+bg batched remat scan on the NeRF++ bench workload.

docs/perf_nerfpp.md round-3 state: the (64,64)-cascade step is compute-
bound at ~52% MFU with ~22% of device time in VMEM writes at remat-chunk
boundaries; the top remaining idea was "fuse fg+bg chunk scans into one
batched scan (halves scan trip count)". ``NerfPPConfig(fuse_fgbg=True)``
implements it (fields/nerfpp.py:stack_fgbg_params / query_fused_chunked);
this script measures it head-to-head at the bench shape (N_rand=2048,
cascade (64,64), full camera, Adam), plus a remat-chunk retune under
fusion (halved trip count can shift the optimum).

Usage: python scripts/ab_fuse_fgbg.py [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(fuse: bool, remat_chunk: int, cascade=(64, 64), n_rand=2048):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera
    from scnerf_tpu.fields.nerfpp import NerfPPConfig, init_nerfpp_net
    from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
    from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import create_train_state

    H, W = 546, 980
    rng = np.random.RandomState(3)
    K = np.array([[580.0, 0, W / 2, 0], [0, 580.0, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    ax = rng.randn(12, 3)
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    E = np.array(embed_rotation_44(axis_angle_to_rotation(
        jnp.asarray(ax), jnp.asarray(rng.rand(12) * 0.3))))
    E[:, :3, 3] = rng.randn(12, 3) * 0.2
    cam = init_camera(K, E, CameraConfig(H=H, W=W, convention=OPENCV,
                                         pixel_offset=0.5))
    pcfg = NerfPPConfig(fuse_fgbg=fuse)
    prcfg = NerfPPRenderConfig(cascade_samples=tuple(cascade),
                               remat_chunk=remat_chunk)
    key = jax.random.key(7)
    params = {
        "levels": [init_nerfpp_net(jax.random.fold_in(key, m), pcfg,
                                   n_images=12) for m in range(2)],
        "camera": cam,
    }
    tx = make_optimizer(5e-4, 750e3, params_example=params)
    state = create_train_state(params, tx)
    step = make_nerfpp_train_step(pcfg, prcfg, NerfPPTrainConfig(),
                                  Curriculum(), tx)
    batch = {
        "px": jnp.asarray(rng.randint(0, W, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, H, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(0),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
        "min_depth": jnp.full((n_rand,), 1e-4),
    }
    return step, state, batch, key, n_rand


def measure(name, fuse, remat_chunk, iters, results, cascade=(64, 64)):
    import jax

    step, state, batch, key, n_rand = build(fuse, remat_chunk, cascade)
    state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    results[name] = dt
    print(f"{name:32s} {dt*1e3:7.2f} ms/step  {n_rand/dt/1e3:7.1f}k rays/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    x = jnp.arange(4.0) @ jnp.ones((4,))
    jax.block_until_ready(x)
    print("[preflight] ok, backend =", jax.default_backend(), flush=True)

    results = {}
    measure("base seq chunk8", False, 8, args.iters, results)
    measure("fused chunk8", True, 8, args.iters, results)
    measure("fused chunk16", True, 16, args.iters, results)
    measure("fused chunk4", True, 4, args.iters, results)

    base = results["base seq chunk8"]
    print("\n== vs base ==")
    for name, dt in results.items():
        print(f"  {name:32s} {base/dt:6.3f}x")


if __name__ == "__main__":
    main()
