"""Device-resident ray-batch sampling.

The reference's hot loop (and our host drivers) generate pixel indices and
gather target RGB in numpy every step. At v5e speeds that HOST work dominates:
the 10ms compiled step sustains only ~36k rays/s against 105k in steady
state. This module moves sampling into the compiled step: the (decoded)
training images live in HBM once, and each step draws ``img_idx``/``px``/
``py`` with the step key and gathers targets on device — the Python loop
shrinks to ``state, metrics = step(state, key)``.

Matches the reference's per-step sampling semantics (one random image,
uniform pixels, optional center precrop — ``run_nerf.py:418-438``) with the
device PRNG replacing numpy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sample_batch_on_device(
    images: jnp.ndarray,
    key,
    n_rand: int,
    n_images: int | None = None,
    precrop_frac: float | None = None,
    single_image: bool = True,
):
    """Draw a pixel batch from device-resident images.

    Args:
      images: ``(N, H, W, 3)`` float array (HBM-resident; pass the same array
        every step so it is not re-transferred).
      key: PRNG key for this step.
      n_rand: rays per batch.
      n_images: images to sample from (defaults to all).
      precrop_frac: optional center-crop fraction (early-iteration precrop).
      single_image: one image per batch (the reference's no-batching mode)
        or per-ray random images.
    Returns:
      dict with ``px``, ``py`` (float32 ``(n_rand,)``), ``img_idx``
      (``(n_rand,)`` int32), ``target`` ``(n_rand, 3)``.
    """
    N, H, W = images.shape[:3]
    n_images = n_images or N
    k_img, k_x, k_y = jax.random.split(key, 3)
    if single_image:
        img = jax.random.randint(k_img, (), 0, n_images)
        img_idx = jnp.full((n_rand,), img, jnp.int32)
    else:
        img_idx = jax.random.randint(k_img, (n_rand,), 0, n_images)
    if precrop_frac is not None:
        dh = int(H // 2 * precrop_frac)
        dw = int(W // 2 * precrop_frac)
        py = jax.random.randint(k_y, (n_rand,), H // 2 - dh, H // 2 + dh)
        px = jax.random.randint(k_x, (n_rand,), W // 2 - dw, W // 2 + dw)
    else:
        py = jax.random.randint(k_y, (n_rand,), 0, H)
        px = jax.random.randint(k_x, (n_rand,), 0, W)
    target = images[img_idx, py, px]
    return {
        "px": px.astype(jnp.float32),
        "py": py.astype(jnp.float32),
        "img_idx": img_idx,
        "target": target,
    }


def make_device_sampling_step(base_step, images, n_rand: int,
                              precrop_frac: float | None = None,
                              single_image: bool = True,
                              steps_per_call: int = 1):
    """Wrap a compiled train step with on-device batch sampling.

    ``base_step`` is a (state, batch, key) -> (state, metrics) function from
    ``make_train_step`` (built with ``donate=False`` recommended when the
    wrapper is jitted with donation here). Returns ``step(state, key)``.

    With ``steps_per_call=K > 1`` the returned function is
    ``step(state, key, it0)`` — it advances K steps in ONE dispatch via
    ``lax.scan``, deriving the per-step key as ``fold_in(key, it0 + i)``
    (the exact stream the host loop uses), so trajectories are
    bit-identical to K calls of the K=1 wrapper. Metrics come back stacked
    ``(K,)``. This amortizes the per-dispatch host gap (measured ~0.7 ms
    against a ~9 ms fern step — see docs/perf_nerf.md).
    """
    images = jnp.asarray(images)

    def one(state, key):
        k_sample, k_step = jax.random.split(key)
        batch = sample_batch_on_device(
            images, k_sample, n_rand,
            precrop_frac=precrop_frac, single_image=single_image,
        )
        return base_step(state, batch, k_step)

    if steps_per_call <= 1:
        return jax.jit(one, donate_argnums=(0,))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, key, it0):
        its = jnp.asarray(it0, jnp.uint32) + jnp.arange(steps_per_call,
                                                        dtype=jnp.uint32)

        def body(s, it):
            return one(s, jax.random.fold_in(key, it))

        return jax.lax.scan(body, state, its)

    return step


def make_nerfpp_device_sampling_step(base_step, images, n_rand: int,
                                     masks=None, min_depths=None,
                                     default_min_depth: float = 1e-4,
                                     intrinsics=None, poses=None):
    """NeRF++ variant of :func:`make_device_sampling_step`: scalar per-step
    image choice (autoexpo indexes a per-image table), device gathers for
    target RGB and the optional mask / per-pixel min-depth maps
    (``nerf_sample_ray_split.py`` carries the same three).

    With ``intrinsics``/``poses`` given ((N, 4, 4) each), rays are built on
    device from the dataset camera (the no-camera-model path); otherwise the
    batch carries ``px``/``py`` for the learnable camera inside
    ``base_step``.
    """
    images = jnp.asarray(images)
    masks = jnp.asarray(masks) if masks is not None else None
    min_depths = jnp.asarray(min_depths) if min_depths is not None else None
    fixed_cam = intrinsics is not None and poses is not None
    if fixed_cam:
        intrinsics = jnp.asarray(intrinsics)
        poses = jnp.asarray(poses)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, key):
        N, H, W = images.shape[:3]
        k_img, k_x, k_y, k_step = jax.random.split(key, 4)
        img = jax.random.randint(k_img, (), 0, N)
        px = jax.random.randint(k_x, (n_rand,), 0, W)
        py = jax.random.randint(k_y, (n_rand,), 0, H)
        batch = {
            "px": px.astype(jnp.float32),
            "py": py.astype(jnp.float32),
            "img_idx": img,
            "target": images[img, py, px],
            "min_depth": (
                min_depths[img, py, px] if min_depths is not None
                else jnp.full((n_rand,), default_min_depth)
            ),
        }
        if fixed_cam:
            from scnerf_tpu.camera.rays import rays_opencv

            batch["rays_o"], batch["rays_d"] = rays_opencv(
                intrinsics[img], poses[img], batch["px"], batch["py"]
            )
        if masks is not None:
            batch["mask"] = masks[img, py, px].astype(jnp.float32)
        return base_step(state, batch, k_step)

    return step
