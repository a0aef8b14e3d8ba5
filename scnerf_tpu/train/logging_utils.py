"""Pluggable metric logging.

The reference hard-requires wandb in both train paths (SURVEY.md section
2.13). Here logging is an interface: a JSONL file logger is always on
(hermetic, greppable), wandb attaches only when requested AND importable.
Also writes the ``args.txt``/``config.txt`` experiment-dir snapshot the
reference produces (``run_nerf.py:210-222``).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricLogger:
    """Coordinator-only by default: on multi-host runs, non-rank-0 processes
    no-op every call (the reference's rank-0 gating of wandb/ckpt writes,
    ``ddp_train_nerf.py:319,563,603``)."""

    def __init__(self, expdir: str, use_wandb: bool = False, wandb_kwargs: dict | None = None,
                 coordinator_only: bool = True):
        self._active = True
        if coordinator_only:
            try:
                import jax

                self._active = jax.process_index() == 0
            except Exception:
                pass
        if not self._active:
            self.expdir = expdir
            self._f = None
            self._wandb = None
            return
        os.makedirs(expdir, exist_ok=True)
        self.expdir = expdir
        self._f = open(os.path.join(expdir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except Exception as e:  # pragma: no cover - wandb optional
                print(f"[log] wandb unavailable ({e}); JSONL only")

    def log(self, step: int, metrics: dict[str, Any]) -> None:
        if not self._active:
            return
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in row.items() if k != "step"}, step=step)

    def log_images(self, step: int, images: dict[str, Any]) -> None:
        """Image summaries (the reference's wandb.Image dashboards,
        ``camera_model.py:54-117`` + ``ddp_train_nerf.py:259-294``): each
        (H, W, 3) float [0,1] array is written to ``expdir/images/`` and,
        when wandb is attached, logged as a wandb.Image."""
        if not self._active or not images:
            return
        import numpy as np

        img_dir = os.path.join(self.expdir, "images")
        os.makedirs(img_dir, exist_ok=True)
        try:
            import imageio.v2 as imageio
        except Exception:  # pragma: no cover
            return
        wb = {}
        for name, img in images.items():
            arr = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
            u8 = (arr * 255.0).round().astype(np.uint8)
            fname = f"{name.replace('/', '_')}_{int(step):08d}.png"
            imageio.imwrite(os.path.join(img_dir, fname), u8)
            if self._wandb is not None:
                wb[name] = self._wandb.Image(u8)
        if wb:
            self._wandb.log(wb, step=int(step))

    def snapshot_config(self, config_json: str) -> None:
        if not self._active:
            return
        with open(os.path.join(self.expdir, "config.json"), "w") as f:
            f.write(config_json)

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
