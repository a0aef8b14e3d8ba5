"""Production serving: AOT compilation, portable artifacts, batch service.

The reference has no deployment story beyond re-running its test drivers
(``/root/reference/NeRF/run_nerf.py:252-283`` render-only mode,
``/root/reference/nerfplusplus/ddp_test_nerf.py:247``) — every process
re-imports the training code, rebuilds the model, and re-traces the render
graph. A TPU serving fleet wants three things those drivers lack:

1. **Compile once, serve many** — a fixed-shape render executable compiled
   ahead of time (`jax.jit(...).lower(...).compile()`), so the first request
   is as fast as the thousandth.
2. **Restartable workers** — :func:`enable_compilation_cache` turns on the
   persistent XLA compile cache so a restarted worker skips the ~40 s
   first-compile entirely.
3. **A portable artifact** — :func:`export_serving_fn` serializes the whole
   render computation (weights baked in as constants) to StableHLO bytes via
   ``jax.export``; :func:`load_serving_fn` runs it WITHOUT the model code,
   on any jax of the same or newer version.

The serve functions bake in the full eval-path semantics of the drivers:
viewdirs normalization, optional NDC warp with the *learned* focal
(``render.py:376-396``), eval-mode render config (``create_nerf.py:86-90``:
perturb=0, raw_noise_std=0), and the rgb clamp (``render.py:404-406``).
Randomness is fixed (det inverse-CDF), so serving is deterministic.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Persistent compile cache
# ---------------------------------------------------------------------------

def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent XLA compilation cache (worker restarts reuse it).

    Returns the cache directory in use.
    """
    cache_dir = cache_dir or os.path.expanduser("~/.cache/scnerf_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving graphs are worth caching no matter how fast they compiled.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


# ---------------------------------------------------------------------------
# Fixed-shape serve functions (pure, jittable, weights closed over)
# ---------------------------------------------------------------------------

def make_nerf_serve_fn(
    params: dict,
    model_cfg,
    render_cfg,
    *,
    ndc: tuple | None = None,
    outputs: Sequence[str] = ("rgb", "depth", "acc", "disp"),
) -> Callable:
    """Build ``fn(rays_o, rays_d, near, far) -> {maps}`` for deployment.

    Args:
      params: trained ``{"coarse": ..., "fine": ...}`` pytree (closed over —
        baked into the export as constants).
      ndc: optional ``(H, W, fx, fy)`` to apply the NDC warp with the learned
        focal before rendering (the LLFF-forward-facing serving path,
        ``render.py:376-396``). Inputs are then world rays; near/far are
        overridden to the NDC 0/1 convention like the reference.
      outputs: which maps to return (smaller artifact / less device->host).
    """
    from scnerf_tpu.render.renderer import render_rays

    eval_cfg = render_cfg.eval_mode()
    fixed_key = jax.random.key(0)

    def fn(rays_o, rays_d, near, far):
        viewdirs = None
        if eval_cfg.use_viewdirs:
            viewdirs = rays_d / (
                jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10
            )
        if ndc is not None:
            from scnerf_tpu.geometry.ndc import ndc_rays

            H, W, fx, fy = ndc
            rays_o, rays_d = ndc_rays(H, W, fx, fy, 1.0, rays_o, rays_d)
            near = jnp.zeros_like(near)
            far = jnp.ones_like(far)
        out = render_rays(
            params, model_cfg, eval_cfg, rays_o, rays_d, viewdirs,
            near, far, fixed_key,
        )
        out["rgb"] = jnp.minimum(out["rgb"], 1.0)  # render.py:404-406
        return {k: out[k] for k in outputs}

    return fn


def make_nerfpp_serve_fn(
    level_params: list,
    model_cfg,
    render_cfg,
    *,
    outputs: Sequence[str] = ("rgb", "fg_depth", "bg_lambda"),
) -> Callable:
    """Build ``fn(ray_o, ray_d, min_depth) -> {maps}`` for NeRF++ serving.

    Returns the last cascade level's maps — what the reference's test driver
    saves (``ddp_test_nerf.py:201-217``).
    """
    from scnerf_tpu.render.nerfpp_renderer import render_rays_nerfpp

    eval_cfg = render_cfg.replace(perturb=False)
    fixed_key = jax.random.key(0)

    def fn(ray_o, ray_d, min_depth):
        outs = render_rays_nerfpp(
            level_params, model_cfg, eval_cfg, ray_o, ray_d, min_depth,
            fixed_key,
        )
        last = outs[-1]
        return {k: last[k] for k in outputs}

    return fn


def nerf_serve_specs(batch: int):
    f32 = jnp.float32
    return (
        jax.ShapeDtypeStruct((batch, 3), f32),  # rays_o
        jax.ShapeDtypeStruct((batch, 3), f32),  # rays_d
        jax.ShapeDtypeStruct((batch,), f32),    # near
        jax.ShapeDtypeStruct((batch,), f32),    # far
    )


def nerfpp_serve_specs(batch: int):
    f32 = jnp.float32
    return (
        jax.ShapeDtypeStruct((batch, 3), f32),  # ray_o
        jax.ShapeDtypeStruct((batch, 3), f32),  # ray_d
        jax.ShapeDtypeStruct((batch,), f32),    # min_depth
    )


# ---------------------------------------------------------------------------
# Portable artifacts (jax.export — StableHLO with weights as constants)
# ---------------------------------------------------------------------------

def export_serving_fn(fn: Callable, specs: Sequence, path: str | None = None) -> bytes:
    """Serialize ``jit(fn)`` at the given arg specs to portable bytes."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*specs)
    data = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(bytes(data))
    return bytes(data)


def load_serving_fn(path_or_bytes) -> Callable:
    """Load an exported serving artifact; returns a callable.

    Needs only jax — none of the scnerf_tpu model code.
    """
    from jax import export as jax_export

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax_export.deserialize(data)

    def fn(*args):
        return exported.call(*args)

    fn.exported = exported  # introspection: in_avals, platforms, ...
    return fn


# ---------------------------------------------------------------------------
# Batch service: pad-and-chunk arbitrary request sizes onto the AOT executable
# ---------------------------------------------------------------------------

class RenderService:
    """Serves arbitrary-size ray batches through one fixed-shape executable.

    The executable is AOT-compiled at construction (no first-request compile
    stall). Requests are padded to the fixed batch (edge-mode, like
    ``render_chunked``) and run in fixed-size slices; per-slice dispatch is
    async so slices pipeline on device.

    With ``mesh=``, inputs/outputs are sharded batch-wise over the mesh's
    devices (the DP-2 serving analogue of ``ddp_test_nerf.py``'s
    rays-split-across-ranks render, ``ddp_train_nerf.py:144-153`` — padding
    replaces its divisibility crash).
    """

    def __init__(self, fn: Callable, specs: Sequence, *, mesh=None):
        self.batch = specs[0].shape[0]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            if self.batch % mesh.devices.size != 0:
                raise ValueError(
                    f"batch {self.batch} not divisible by mesh size "
                    f"{mesh.devices.size}"
                )
            shardings = tuple(
                NamedSharding(mesh, P(axis, *([None] * (len(s.shape) - 1))))
                for s in specs
            )
            jitted = jax.jit(fn, in_shardings=shardings)
        else:
            jitted = jax.jit(fn)
        self._compiled = jitted.lower(*specs).compile()

    def __call__(self, *arrays) -> dict[str, np.ndarray]:
        n = arrays[0].shape[0]
        b = self.batch
        n_slices = max(1, -(-n // b))
        pad = n_slices * b - n

        def _pad(x):
            x = np.asarray(x, np.float32)
            return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), mode="edge")

        padded = [_pad(x) for x in arrays]
        outs = []
        for i in range(n_slices):  # async dispatch pipelines the slices
            outs.append(self._compiled(*(x[i * b:(i + 1) * b] for x in padded)))
        result: dict[str, np.ndarray] = {}
        for k in outs[0]:
            result[k] = np.concatenate([np.asarray(o[k]) for o in outs])[:n]
        return result

    @property
    def cost_analysis(self):
        return self._compiled.cost_analysis()
