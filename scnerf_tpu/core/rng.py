"""Reproducibility utilities.

Rebuild of ``fix_seeds`` (``/root/reference/NeRF/run_nerf_helpers.py:160-169``)
and the per-rank seeding scheme (``ddp_train_nerf.py:362-365``): in JAX the
model/step randomness is already explicit (keys), so seeding covers numpy
(host-side pixel sampling) plus helpers for deriving per-device keys —
``fold_in(key, axis_index)`` gives every shard distinct rays with identical
init, replacing the reference's ``(rank+1)*777`` convention.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def fix_seeds(seed: int = 777) -> np.random.RandomState:
    """Seed host-side RNGs; returns a dedicated RandomState for samplers."""
    np.random.seed(seed)
    random.seed(seed)
    return np.random.RandomState(seed)


def device_key(key, axis_name: str):
    """Per-shard key inside ``shard_map``/collective contexts."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def step_key(key, step):
    """Per-iteration key (host loop)."""
    return jax.random.fold_in(key, step)
