"""A/B the RENDER (eval/serving) path levers on the real chip.

The train-step levers are settled (docs/perf_nerf.md), but the eval
renderer inherits the train defaults — in particular ``remat_chunk=16``,
whose sample-chunk ``lax.scan`` + ``jax.checkpoint`` only pays off in the
*backward* pass (working-set control). A forward-only render gets the
scan serialization and per-chunk VMEM round-trips with none of the
benefit. Levers measured head-to-head at the bench render workload
(65536 rays, 64+64 samples, full camera, `bench.py` shapes):

  1. ``remat_chunk``: 16 (train default) vs 0 (one batched query).
  2. ray ``chunk``: 8192 (reference chunk, render.py:398) vs 16384/32768.

Usage: python scripts/ab_render.py [--iters 5]
Prints one ms + rays/s line per variant.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_render(chunk: int, remat_chunk: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scnerf_tpu.camera.rays import pixels_to_rays
    from scnerf_tpu.render.renderer import render_chunked

    model_cfg, render_cfg, params = _flagship()
    eval_cfg = render_cfg.eval_mode().replace(chunk=chunk,
                                              remat_chunk=remat_chunk)
    rng = np.random.RandomState(0)
    n_render = 65536
    px = jnp.asarray(rng.randint(0, 1008, n_render).astype(np.float32))
    py = jnp.asarray(rng.randint(0, 756, n_render).astype(np.float32))

    @jax.jit
    def render(params, px, py, key):
        rays_o, rays_d = pixels_to_rays(params["camera"], px, py,
                                        image_idx=jnp.zeros_like(px, jnp.int32))
        vd = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
        return render_chunked(params, model_cfg, eval_cfg, rays_o, rays_d, vd,
                              2.0, 6.0, key)["rgb"]

    return render, params, px, py, n_render


def measure(label: str, chunk: int, remat_chunk: int, iters: int):
    import jax

    render, params, px, py, n = build_render(chunk, remat_chunk)
    key = jax.random.key(0)
    out = render(params, px, py, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = render(params, px, py, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[ab_render] {label:34s} {dt * 1e3:8.2f} ms  "
          f"{n / dt:10.1f} rays/s", flush=True)
    return n / dt


def main(iters: int):
    import jax
    import jax.numpy as jnp

    v = (jnp.arange(4.0) @ jnp.ones((4,))).block_until_ready()
    print(f"[preflight] backend={jax.default_backend()} ok ({float(v)})",
          flush=True)
    results = {}
    for label, chunk, rc in [
        ("baseline chunk=8192 remat=16", 8192, 16),
        ("remat off, chunk=8192", 8192, 0),
        ("remat off, chunk=16384", 16384, 0),
        ("remat off, chunk=32768", 32768, 0),
        ("remat off, chunk=65536", 65536, 0),
        ("remat=16, chunk=32768", 32768, 16),
    ]:
        results[label] = measure(label, chunk, rc, iters)
    base = results["baseline chunk=8192 remat=16"]
    best = max(results, key=results.get)
    print(f"[ab_render] best: {best} ({results[best] / base - 1:+.1%} "
          "vs baseline)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()
    from _watchdog import supervise

    supervise()
    main(a.iters)
