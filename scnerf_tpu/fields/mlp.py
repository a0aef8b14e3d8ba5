"""Functional dense-layer primitives with reference-matching init.

Replaces ``DenseLayer`` (``/root/reference/NeRF/run_nerf_helpers.py:13-21``):
Xavier-uniform weights with activation gain (sqrt(2) for relu, 1 for linear),
zero bias. Parameters are plain ``{"w": (in, out), "b": (out,)}`` dicts so the
whole model is one flat pytree that shards/jits/masks cleanly.

All matmuls go through :func:`dense`, which casts to a configurable compute
dtype (bfloat16 on TPU for the MXU) while accumulating in float32.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_dense(key, in_dim: int, out_dim: int, activation: str = "relu", dtype=jnp.float32):
    gain = math.sqrt(2.0) if activation == "relu" else 1.0
    limit = gain * math.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), dtype, minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def dense(params, x, compute_dtype=None):
    """``x @ w + b`` with optional low-precision compute, f32 accumulation."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None and w.dtype != compute_dtype:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)
