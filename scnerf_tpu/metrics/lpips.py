"""LPIPS (VGG16 flavor) in pure JAX.

Replaces the reference's ``piqa.LPIPS(network="vgg")``
(``/root/reference/NeRF/run_nerf.py:79-80``). The metric is the Zhang et al.
formulation: VGG16 conv features at relu1_2 .. relu5_3, unit-normalized per
channel, squared differences combined by learned 1x1 linear heads, averaged
spatially and summed over layers.

Pretrained VGG16 + linear-head weights cannot be downloaded in this
environment (zero egress); :func:`load_weights` reads them from an ``.npz``
at ``$SCNERF_LPIPS_WEIGHTS`` when provided (keys documented below).
:func:`lpips_available` gates usage; eval code reports LPIPS only when
weights exist — otherwise the metric is omitted rather than faked.

Weight file format (npz):
  ``conv{i}_w``: (kh, kw, cin, cout) for the 13 VGG16 convs, i in [0, 13)
  ``conv{i}_b``: (cout,)
  ``lin{j}_w``: (c_j,) diagonal 1x1 head weights for the 5 tap layers
  ``shift``: (3,), ``scale``: (3,) input normalization
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, tap_after) — tap means the relu output
# feeds an LPIPS head; 'M' = maxpool.
_VGG16_PLAN = [64, 64, "tap", "M", 128, 128, "tap", "M", 256, 256, 256, "tap", "M",
               512, 512, 512, "tap", "M", 512, 512, 512, "tap"]

_DEFAULT_ENV = "SCNERF_LPIPS_WEIGHTS"


def lpips_available(path: str | None = None) -> bool:
    path = path or os.environ.get(_DEFAULT_ENV, "")
    return bool(path) and os.path.exists(path)


def load_weights(path: str | None = None) -> dict:
    path = path or os.environ.get(_DEFAULT_ENV)
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def lpips(pred: jnp.ndarray, target: jnp.ndarray, weights: dict) -> jnp.ndarray:
    """LPIPS distance between (H, W, 3) images in [0, 1]."""

    def features(img):
        x = (img[None] * 2.0 - 1.0 - weights["shift"]) / weights["scale"]
        feats = []
        ci = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            elif item == "tap":
                feats.append(x)
            else:
                x = jax.nn.relu(_conv(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"]))
                ci += 1
        return feats

    f0 = features(pred)
    f1 = features(target)
    total = 0.0
    for j, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        total = total + jnp.mean(jnp.sum(d * weights[f"lin{j}_w"], axis=-1))
    return total
