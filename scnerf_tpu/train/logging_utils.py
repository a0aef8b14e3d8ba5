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
    def __init__(self, expdir: str, use_wandb: bool = False, wandb_kwargs: dict | None = None):
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

    def snapshot_config(self, config_json: str) -> None:
        with open(os.path.join(self.expdir, "config.json"), "w") as f:
            f.write(config_json)

    def close(self) -> None:
        self._f.close()
