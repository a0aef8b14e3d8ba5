"""Camera-parameter curriculum as gradient masking.

The reference toggles ``requires_grad_`` on camera noise tensors at iteration
thresholds (``/root/reference/NeRF/run_nerf.py:330-348``,
``/root/reference/nerfplusplus/ddp_train_nerf.py:394-415``,
``nerfplusplus/create_nerf.py:131-153``) — imperative state mutation that
can't live inside a compiled step. Here the curriculum is a pure function of
the step counter: gradients of not-yet-active parameter groups are zeroed
inside ``jit``, so one compiled train step serves the whole schedule and
resume re-derives the state from ``step`` exactly like the reference does.

Thresholds (reference flag names):
- ``add_ie``: intrinsics + extrinsics noise (``config_argparse.py:321-333``)
- ``add_od``: ray-origin / ray-direction grids ("od" = o,d noise)
- ``add_radial``: distortion noise (NeRF++ only)
- ``add_prd``: projected-ray-distance loss activation (a loss weight gate,
  not a gradient mask)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.camera.model import Camera


@pytree_dataclass
class Curriculum:
    add_ie: int = static_field(default=0)
    add_od: int = static_field(default=0)
    add_radial: int = static_field(default=0)
    add_prd: int = static_field(default=0)
    # PRD loss cadence + weight (run_nerf.py:508; config_argparse.py:119-128).
    i_ray_dist_loss: int = static_field(default=10)
    ray_dist_loss_weight: float = static_field(default=1e-4)
    # Calibration-phase anneal for the PRD protocol itself: from-scratch
    # k-recovery raises weight/cadence above the published values, and —
    # exactly like the camera-LR mults (optim.camera_lrate_mult_until) —
    # the boost must END once the camera has converged, or the hot PRD
    # keeps pushing k along the rot↔k degenerate valley past truth
    # (measured: K_J_annealed_horizon.json, k1 exact at step 7500 then
    # monotone overshoot to err 0.03 by 10k while rot degrades 0.6→0.78°).
    # At step >= prd_anneal_until the weight drops to
    # ray_dist_loss_weight_after and the host cadence switches to
    # i_ray_dist_loss_after (both default to the published protocol's
    # values when annealing is enabled; 0 = no anneal, reference-exact).
    prd_anneal_until: int = static_field(default=0)
    ray_dist_loss_weight_after: float = static_field(default=1e-4)
    i_ray_dist_loss_after: int = static_field(default=10)


def mask_camera_grads(grads: Camera, step, cur: Curriculum) -> Camera:
    """Zero gradients of parameter groups not yet unlocked at ``step``."""
    ie = (step >= cur.add_ie).astype(jnp.float32)
    od = (step >= cur.add_od).astype(jnp.float32)
    ra = (step >= cur.add_radial).astype(jnp.float32)
    return grads.replace(
        intrinsics_noise=grads.intrinsics_noise * ie,
        extrinsics_noise=grads.extrinsics_noise * ie,
        ray_o_grid=grads.ray_o_grid * od,
        ray_d_grid=grads.ray_d_grid * od,
        distortion_noise=grads.distortion_noise * ra,
    )


def mask_tree_camera_grads(grads, step, cur: Curriculum):
    """Apply :func:`mask_camera_grads` to every Camera node in a pytree."""
    return jax.tree_util.tree_map(
        lambda n: mask_camera_grads(n, step, cur) if isinstance(n, Camera) else n,
        grads,
        is_leaf=lambda n: isinstance(n, Camera),
    )


def prd_active(step, cur: Curriculum):
    """Whether the PRD loss contributes at ``step`` (scaled by its weight)."""
    w = cur.ray_dist_loss_weight
    if cur.prd_anneal_until > 0:
        # Static thresholds/values -> a single compiled step serves both
        # phases (same trick as the grad masks above).
        w = jnp.where(step < cur.prd_anneal_until, w,
                      cur.ray_dist_loss_weight_after)
    return (step >= cur.add_prd).astype(jnp.float32) * w


def prd_cadence_at(it: int, cur: Curriculum) -> int:
    """Host-loop PRD dispatch cadence at iteration ``it`` (the cadence is a
    host-side dispatch decision, not part of the compiled step)."""
    if cur.prd_anneal_until > 0 and it >= cur.prd_anneal_until:
        return max(int(cur.i_ray_dist_loss_after), 1)
    return max(int(cur.i_ray_dist_loss), 1)
