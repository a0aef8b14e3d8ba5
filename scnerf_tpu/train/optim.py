"""Optimizer construction.

Replaces ``CustomAdamOptimizer``/``f_custom_adam``
(``/root/reference/NeRF/create_nerf.py:199-336``,
``/root/reference/nerfplusplus/custom_optim.py``): plain Adam, except L2
weight decay is folded into the *gradient* (pre-moment, classic Adam-L2, not
AdamW — ``create_nerf.py:238-239``) for ONLY the non-linear camera noise
parameters (ray-origin grid, ray-direction grid, distortion noise). Expressed
as an optax chain with a pytree mask instead of the reference's
"last-K-params-by-name-substring" counting.

Also the exponential LR schedule ``lr * 0.1^(step / decay_steps)``
(``run_nerf.py:615-621``; NeRF++ variant ``ddp_train_nerf.py:386-392``).
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def exp_decay_schedule(lr_init: float, decay_factor: float, decay_steps: float,
                       lr_floor: float = 0.0):
    """``lr(step) = max(lr_init * decay_factor^(step / decay_steps), floor)``.

    The NeRF schedule has no floor (``run_nerf.py:617-619``); NeRF++ clamps
    at 1% of the initial rate (``ddp_train_nerf.py:388-390``) — pass
    ``lr_floor = 0.01 * lr_init`` there.
    """

    def schedule(step):
        lr = lr_init * (decay_factor ** (step / decay_steps))
        if lr_floor > 0.0:
            import jax.numpy as jnp

            lr = jnp.maximum(lr, lr_floor)
        return lr

    return schedule


def _camera_mask(params: Any, true_fields: tuple) -> Any:
    """Boolean mask pytree: True on the named Camera fields, False elsewhere."""
    from scnerf_tpu.camera.model import Camera

    def mark(node):
        if isinstance(node, Camera):
            kw = {
                f: (f in true_fields)
                for f in (
                    "intrinsics_init", "extrinsics_init", "distortion_init",
                    "intrinsics_noise", "extrinsics_noise", "distortion_noise",
                    "ray_o_grid", "ray_d_grid",
                )
            }
            return node.replace(**kw)
        return jax.tree.map(lambda _: False, node)

    return jax.tree_util.tree_map(mark, params, is_leaf=lambda n: isinstance(n, Camera))


def noise_decay_mask(params: Any) -> Any:
    """True for leaves that receive weight decay: the camera's ray_o_grid /
    ray_d_grid / distortion_noise (the reference's rayo/rayd/dist params,
    ``create_nerf.py:219-226``)."""
    return _camera_mask(params, ("ray_o_grid", "ray_d_grid", "distortion_noise"))


def frozen_mask(params: Any) -> Any:
    """True for leaves that must NEVER update (the camera's frozen initials —
    ``requires_grad=False`` params in the reference)."""
    return _camera_mask(params, ("intrinsics_init", "extrinsics_init", "distortion_init"))


def clip_grads_elementwise(bound: float) -> optax.GradientTransformation:
    """Element-wise gradient clamp to ``[-bound, bound]``.

    Unlike ``clip_by_global_norm`` this maps inf -> bound (a single inf makes
    the global norm inf and turns every gradient into NaN via 0*inf). Used as
    a production guard against optimizer-state poisoning: one pathological
    step otherwise drives Adam's second moment to inf permanently.
    """

    def update(updates, state, params=None):
        import jax.numpy as jnp

        return jax.tree.map(lambda g: jnp.clip(g, -bound, bound), updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def camera_pose_mask(params: Any) -> Any:
    """True for the camera's global calibration parameters (intrinsics /
    extrinsics / distortion noise) — the leaves ``camera_lr_mult`` scales."""
    return _camera_mask(
        params, ("intrinsics_noise", "extrinsics_noise", "distortion_noise"))


def distortion_mask(params: Any) -> Any:
    """True for the camera's distortion_noise leaf only — the leaf
    ``distortion_lr_mult`` scales (composes with ``camera_lr_mult``)."""
    return _camera_mask(params, ("distortion_noise",))


def _annealed_scale(mult: float, until: int,
                    hold: float = 1.0) -> optax.GradientTransformation:
    """``optax.scale(mult)`` for the first ``until`` steps, ``hold`` after
    (``until = 0`` holds ``mult`` forever; ``hold`` defaults to 1.0 =
    reference-exact post-anneal).

    ``hold < 1`` is the POST-CONVERGENCE HOLD phase: once the camera is
    inside the scene's identifiability floor (rot ~0.5 deg / focal ~1%,
    docs/calibration_convergence.md round-4e) the photometric camera
    gradient is valley-floor noise the field co-adapts to, and at the
    shared LR the camera random-walks away from the converged point over
    long horizons (measured: 200k published-protocol soak drifts focal
    1.0% @25k -> 1.6% @50k while held-out PSNR keeps improving). Damping
    the calibration leaves 4-8x below the shared LR keeps the PRD anchor
    binding without freezing (the reference never freezes either;
    create_nerf.py:199-336 shares one LR throughout)."""
    if until > 0:
        def _sched(count, _m=mult, _u=until, _h=hold):
            import jax.numpy as jnp

            return jnp.where(count < _u, _m, _h)

        return optax.scale_by_schedule(_sched)
    return optax.scale(mult)


def make_optimizer(
    lr_init: float,
    decay_steps: float,
    decay_factor: float = 0.1,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    params_example: Any = None,
    grad_clip: float = 1e6,
    lr_floor: float = 0.0,
    camera_lr_mult: float = 1.0,
    camera_lr_mult_until: int = 0,
    camera_lr_mult_hold: float = 1.0,
    distortion_lr_mult: float = 1.0,
    distortion_lr_mult_until: int = 0,
    distortion_lr_mult_hold: float = 1.0,
) -> optax.GradientTransformation:
    """Adam + exp decay + masked L2-in-grad decay + frozen-initials zeroing.

    ``grad_clip``: element-wise gradient bound (0 disables). The default 1e6
    is far above any healthy gradient; it only guards against pathological
    overflow poisoning Adam state.

    ``camera_lr_mult``: EXTENSION beyond the reference (which shares one Adam
    LR across field and camera, ``create_nerf.py:199-336``). Scales the
    post-Adam update on the camera's global calibration leaves
    (intrinsics/extrinsics/distortion noise — NOT the per-ray grids, whose
    decay balance the shared LR sets). Motivation: Adam's per-parameter
    velocity is ~lr in PARAMETER units, so the handful of calibration scalars
    crawl at the field's LR while their (clean, PRD-driven) signal could
    support a much larger one — measured in docs/calibration_convergence.md.
    1.0 (the default) is reference-exact.

    ``distortion_lr_mult`` (+``_until``): extra multiplier on the
    distortion_noise leaf only, composing with ``camera_lr_mult``. The
    from-scratch fisheye protocol (BASELINE config 5) must move k1 by 12
    noise-units (|k1|=0.12 at scale 1e-2) where focal needs 0.05 — a 240x
    longer trip at Adam's ~lr/step velocity, hence its own (larger) mult.

    ``camera_lr_mult_until``: anneal the multiplier back to 1.0 after this
    many steps (0 = hold forever). Measured necessity: at mult=8 held past
    convergence the camera performs a dolly-zoom random walk the field
    co-adapts to (20k soak: focal 5%→0.6% by 5k, then drifting to 10.7% by
    15k — SOAK_NERF_QUALITY_CLM8_DRIFT curve); a calibration *phase* keeps
    the 30× convergence speedup and the post-convergence stability of the
    shared LR.
    """
    schedule = exp_decay_schedule(lr_init, decay_factor, decay_steps, lr_floor)
    chain = []
    if grad_clip > 0:
        chain.append(clip_grads_elementwise(grad_clip))
    if weight_decay > 0.0 and params_example is not None:
        mask = noise_decay_mask(params_example)
        chain.append(optax.masked(optax.add_decayed_weights(weight_decay), mask))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.scale_by_learning_rate(schedule))
    if ((camera_lr_mult != 1.0 or camera_lr_mult_hold != 1.0)
            and params_example is not None):
        cmask = camera_pose_mask(params_example)
        chain.append(optax.masked(
            _annealed_scale(camera_lr_mult, camera_lr_mult_until,
                            camera_lr_mult_hold), cmask))
    if ((distortion_lr_mult != 1.0 or distortion_lr_mult_hold != 1.0)
            and params_example is not None):
        # Composes with camera_lr_mult: effective distortion mult = product.
        dmask = distortion_mask(params_example)
        chain.append(optax.masked(
            _annealed_scale(distortion_lr_mult, distortion_lr_mult_until,
                            distortion_lr_mult_hold),
            dmask))
    if params_example is not None:
        fmask = frozen_mask(params_example)
        chain.append(optax.masked(optax.set_to_zero(), fmask))
    return optax.chain(*chain)
