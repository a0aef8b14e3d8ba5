"""A/B the custom-VJP fused Pallas inverse-CDF on the NeRF++ bench workload.

Round-3 VERDICT weak #4: NeRF++ keeps gradients flowing through the
resample bins (``ddp_train_nerf.py:459-473``), so the non-differentiable
Pallas kernel couldn't serve that hot path and the custom-VJP variant was
the one unmeasured lever. ``kernels/pdf_pallas.py:sample_pdf_pallas_diff``
implements it (fused forward emitting searchsorted indices, hand-written
one-hot-contraction backward). This script, at the bench shape
(N_rand=2048, cascade (64,64), full camera, Adam):

1. checks gradient EQUIVALENCE on-chip: one train step from identical
   state under pdf_impl "xla" vs "pallas_vjp" must produce matching loss
   and parameter updates (tolerance: TPU f32 nondeterminism);
2. measures ms/step head-to-head.

Usage: python scripts/ab_pdf_vjp.py [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(pdf_impl: str, cascade=(64, 64), n_rand=2048, perturb=True,
          sgd=False):
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
    pcfg = NerfPPConfig()
    prcfg = NerfPPRenderConfig(cascade_samples=tuple(cascade),
                               perturb=perturb, pdf_impl=pdf_impl)
    key = jax.random.key(7)
    params = {
        "levels": [init_nerfpp_net(jax.random.fold_in(key, m), pcfg,
                                   n_images=12) for m in range(2)],
        "camera": cam,
    }
    if sgd:
        # Identity-descent: params_after - params_before == -grad, so the
        # equivalence check compares RAW GRADIENTS (a first Adam step is
        # ~lr*sign(g) — sign flips at g~0 would drown the comparison).
        import optax

        tx = optax.sgd(1.0)
    else:
        tx = make_optimizer(5e-4, 750e3, params_example=params)
    state = create_train_state(params, tx)
    step = make_nerfpp_train_step(pcfg, prcfg, NerfPPTrainConfig(),
                                  Curriculum(), tx, donate=False)
    batch = {
        "px": jnp.asarray(rng.randint(0, W, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, H, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(0),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
        "min_depth": jnp.full((n_rand,), 1e-4),
    }
    return step, state, batch, key, n_rand


def equivalence_check():
    """Same key, same state: one step under each impl must match.

    ``perturb=True`` draws identical uniforms from the same fold_in key in
    both impls (the u draw happens in the renderer for pallas_vjp and in
    ``sample_pdf`` for xla — same ``jax.random.uniform(key, shape)`` call),
    so the trajectories are comparable step-for-step.
    """
    import jax
    import numpy as np

    outs = {}
    for impl in ("xla", "pallas_vjp"):
        step, state, batch, key, _ = build(impl, sgd=True)
        p0 = jax.tree.map(np.asarray, state.params)
        st, metrics = step(state, batch, key)
        jax.block_until_ready(st.params)
        grads = jax.tree.map(lambda a, b: np.asarray(a) - b, p0, st.params)
        outs[impl] = (float(metrics["loss"]), jax.tree.leaves_with_path(grads))
    l_x, g_x = outs["xla"]
    l_p, g_p = outs["pallas_vjp"]
    dl = abs(l_x - l_p) / max(abs(l_x), 1e-12)
    # Element-wise max-rel is NOT the right metric here: near-degenerate
    # resample entries (denom ~ eps -> 1/denom ~ 1e6) amplify ulp-level
    # forward-recompute differences into %-level per-element grad diffs in
    # BOTH directions (a CPU control with bit-identical forwards showed
    # max-rel up to 2.7e-3 while every leaf kept cosine >= 0.999999 and
    # norm ratio within 1e-4). Gate on direction + magnitude per leaf.
    worst_cos, worst_ratio, worst_leaf = 1.0, 1.0, None
    for (path, a), (_, b) in zip(g_x, g_p):
        if a.dtype.kind != "f":
            continue
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0:
            assert nb == 0.0, path
            continue
        cos = float((a * b).sum() / (na * nb + 1e-30))
        ratio = float(nb / na)
        if cos < worst_cos:
            worst_cos, worst_leaf = cos, jax.tree_util.keystr(path)
        worst_ratio = max(worst_ratio, ratio, 1.0 / max(ratio, 1e-30))
    print(f"[equiv] rel loss diff {dl:.3e}; worst grad cosine {worst_cos:.8f} "
          f"at {worst_leaf}; worst norm ratio {worst_ratio:.6f}", flush=True)
    assert dl < 1e-4 and worst_cos > 0.9999 and worst_ratio < 1.01, \
        "pallas_vjp != xla gradients"


def measure(name, impl, iters, results):
    import jax

    step, state, batch, key, n_rand = build(impl)
    state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    results[name] = dt
    print(f"{name:24s} {dt*1e3:7.2f} ms/step  {n_rand/dt/1e3:7.1f}k rays/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip_equiv", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    x = jnp.arange(4.0) @ jnp.ones((4,))
    jax.block_until_ready(x)
    print("[preflight] ok, backend =", jax.default_backend(), flush=True)

    if not args.skip_equiv:
        equivalence_check()

    results = {}
    measure("xla", "xla", args.iters, results)
    measure("pallas_vjp", "pallas_vjp", args.iters, results)
    base = results["xla"]
    print("\n== vs xla ==")
    for name, dt in results.items():
        print(f"  {name:24s} {base/dt:6.3f}x")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _watchdog import supervise

    supervise()
    main()
