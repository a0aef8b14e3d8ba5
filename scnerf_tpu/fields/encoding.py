"""Sinusoidal positional encoding.

Rebuild of both reference embedders
(``/root/reference/NeRF/run_nerf_helpers.py:24-72`` and
``/root/reference/nerfplusplus/nerf_network.py:11-60``). Feature ordering
matches the reference exactly — ``[x, sin(f0 x), cos(f0 x), sin(f1 x), ...]``
— so calibrated checkpoints map 1:1.

TPU note: computed as one broadcast multiply ``x[..., None, :] * freqs`` plus
fused sin/cos — a single VPU pass, no per-frequency Python closures.
"""
from __future__ import annotations

import jax.numpy as jnp

from scnerf_tpu.core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class EncodingConfig:
    input_dim: int = static_field(default=3)
    n_freqs: int = static_field(default=10)
    max_freq_log2: float = static_field(default=None)  # default n_freqs - 1
    include_input: bool = static_field(default=True)
    log_sampling: bool = static_field(default=True)

    @property
    def out_dim(self) -> int:
        d = self.input_dim if self.include_input else 0
        return d + self.input_dim * self.n_freqs * 2


def freq_bands(cfg: EncodingConfig) -> jnp.ndarray:
    max_freq = cfg.max_freq_log2 if cfg.max_freq_log2 is not None else cfg.n_freqs - 1
    if cfg.log_sampling:
        return 2.0 ** jnp.linspace(0.0, max_freq, cfg.n_freqs)
    return jnp.linspace(2.0**0.0, 2.0**max_freq, cfg.n_freqs)


def positional_encoding(x: jnp.ndarray, cfg: EncodingConfig) -> jnp.ndarray:
    """Encode ``(..., input_dim)`` -> ``(..., out_dim)``."""
    if cfg.n_freqs == 0:
        return x
    freqs = freq_bands(cfg).astype(x.dtype)  # (F,)
    xb = x[..., None, :] * freqs[:, None]  # (..., F, D)
    # Interleave per frequency as [sin(f x), cos(f x)] to match the
    # reference's [p_fn for p_fn in (sin, cos)] inner loop ordering.
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # (..., F, 2D)
    enc = enc.reshape(*x.shape[:-1], cfg.n_freqs * 2 * x.shape[-1])
    if cfg.include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
