"""Checkpoint save/restore via orbax.

Rebuild of the reference's checkpointing (SURVEY.md section 2.14):

- periodic save of ``{step, params (incl. camera), optimizer state}``
  (``/root/reference/NeRF/run_nerf.py:626-641``, ``nerfplusplus/
  ddp_train_nerf.py:603-617``),
- auto-resume from the latest checkpoint in the experiment dir
  (``NeRF/create_nerf.py:142-173``),
- warm-start / transfer with *partial* state loading: the reference's
  ``load_camera`` skips extrinsics keys, ``--ft_path`` merges optimizer
  state (``nerfplusplus/create_nerf.py:114-129``; ``NeRF/create_nerf.py:
  161-164``). Here: :func:`merge_states` copies only path+shape-matching
  leaves, and :func:`restore_camera_partial` drops chosen camera fields.

Curriculum state is *not* stored — it re-derives from ``step`` (the
reference's behavior, ``create_nerf.py:131-153``).
"""
from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp

from scnerf_tpu.train.step import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d+)$")
_OPTIM_META = "optim_meta.json"


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{step:09d}")


def optim_knobs(cfg) -> dict:
    """The ExperimentConfig knobs that change the optax chain STRUCTURE
    (masked scale transforms are appended only when a mult != 1 —
    ``train/optim.py:make_optimizer``), so an opt-state checkpoint is only
    restorable when they are replayed exactly. Persisted next to every
    checkpoint and validated on restore."""
    o = cfg.optim
    return {
        "camera_lrate_mult": float(o.camera_lrate_mult),
        "camera_lrate_mult_until": int(o.camera_lrate_mult_until),
        "camera_lrate_mult_hold": float(
            getattr(o, "camera_lrate_mult_hold", 1.0)),
        "distortion_lrate_mult": float(o.distortion_lrate_mult),
        "distortion_lrate_mult_until": int(o.distortion_lrate_mult_until),
        "distortion_lrate_mult_hold": float(
            getattr(o, "distortion_lrate_mult_hold", 1.0)),
    }


def save_checkpoint(ckpt_dir: str, state: TrainState, keep: int = 3,
                    optim_meta: dict | None = None) -> str:
    """Save state at its current step; prune old checkpoints to ``keep``.

    ``optim_meta``: optimizer-structure knobs (:func:`optim_knobs`) written
    alongside the checkpoints so a resume can validate them."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    path = _ckpt_path(ckpt_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if optim_meta is not None:
        import json

        with open(os.path.join(ckpt_dir, _OPTIM_META), "w") as f:
            json.dump(optim_meta, f)
    steps = sorted(list_checkpoint_steps(ckpt_dir))
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(_ckpt_path(ckpt_dir, s), ignore_errors=True)
    return path


def list_checkpoint_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def restore_checkpoint(ckpt_dir: str, example: TrainState, step: int | None = None,
                       optim_meta: dict | None = None):
    """Restore latest (or a specific step); None when no checkpoint exists.

    ``optim_meta``: the restoring experiment's :func:`optim_knobs`. When the
    checkpoint directory carries a saved meta that disagrees, restoration
    fails loudly — the optax chain structure would not match and the
    opt-state pytree restore would be silently wrong or crash downstream
    (the diag_rot_plateau.py footgun, now impossible to hit silently)."""
    steps = list_checkpoint_steps(ckpt_dir)
    if not steps:
        return None
    meta_path = os.path.join(os.path.abspath(ckpt_dir), _OPTIM_META)
    if optim_meta is not None and os.path.exists(meta_path):
        import json

        saved = json.load(open(meta_path))
        diff = {k: (saved[k], optim_meta[k]) for k in saved
                if k in optim_meta and saved[k] != optim_meta[k]}
        if diff:
            raise ValueError(
                f"checkpoint {ckpt_dir} was written with optimizer knobs "
                f"{saved}, but this experiment uses {optim_meta} "
                f"(mismatch: {diff}). These knobs change the optax chain "
                "structure (train/optim.py); replay them exactly — e.g. "
                "read them back from the expdir's config.json.")
    step = steps[-1] if step is None else step
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(example))
    return ckptr.restore(_ckpt_path(ckpt_dir, step), abstract)


def merge_states(template, restored):
    """Copy leaves of ``restored`` into ``template`` where path and shape
    match (the reference's optimizer-state merge-on-load)."""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(restored)
    if len(t_leaves) == len(r_leaves):
        out = [
            r if getattr(r, "shape", None) == getattr(t, "shape", None) else t
            for t, r in zip(t_leaves, r_leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)
    return template


def restore_camera_partial(template_camera, restored_camera, skip_extrinsics: bool = True):
    """The reference's ``load_camera`` transfer mode: take every calibrated
    camera field from the checkpoint except (optionally) the per-image
    extrinsics, which stay at the template's initialization
    (``nerfplusplus/create_nerf.py:114-123``)."""
    cam = restored_camera
    if skip_extrinsics:
        cam = cam.replace(
            extrinsics_init=template_camera.extrinsics_init,
            extrinsics_noise=template_camera.extrinsics_noise,
        )
    return cam.replace(config=template_camera.config)
