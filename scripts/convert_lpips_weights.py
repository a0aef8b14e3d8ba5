"""Convert torchvision-VGG16 + LPIPS linear-head weights to the npz format
``scnerf_tpu.metrics.lpips`` loads (round-1 VERDICT item 4).

The image has no torchvision/lpips packages and zero egress, so this script
consumes files the user supplies:

  python scripts/convert_lpips_weights.py \
      --vgg16 vgg16-397923af.pth \
      --lpips vgg.pth \
      --out lpips_vgg16.npz

- ``--vgg16``: a torch checkpoint of torchvision's VGG16 (state dict with
  ``features.{i}.weight`` keys, or a full dict containing one). If the
  torchvision package IS importable, pass ``--vgg16 torchvision`` to pull
  the pretrained weights through it.
- ``--lpips``: the LPIPS project's learned linear heads for the "vgg" net
  (keys ``lin{j}.model.1.weight``, shape (1, C, 1, 1)). Without it the
  metric is NOT the published LPIPS; ``--uniform-heads`` substitutes 1/C
  averaging heads for smoke use only and stamps the npz with
  ``uniform_heads=1`` so downstream logs can flag it.

Then: ``export SCNERF_LPIPS_WEIGHTS=/path/lpips_vgg16.npz`` and every eval
path (evaluate_test_views, evaluate_nerfpp, cli/render) reports LPIPS.

Output keys (see metrics/lpips.py): conv{0..12}_{w,b} in HWIO, lin{0..4}_w
(C,), shift (3,), scale (3,).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision vgg16.features indices of the 13 convs, in order.
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# LPIPS tap channel widths at relu{1_2,2_2,3_3,4_3,5_3}.
TAP_CHANNELS = [64, 128, 256, 512, 512]
# LPIPS input normalisation constants (Zhang et al. reference code).
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_vgg16_state(source: str) -> dict:
    import torch

    if source == "torchvision":
        import torchvision

        model = torchvision.models.vgg16(weights="IMAGENET1K_V1")
        return {k: v for k, v in model.state_dict().items()}
    ckpt = torch.load(source, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt


def vgg16_to_npz_entries(sd: dict) -> dict:
    out = {}
    for i, idx in enumerate(VGG16_CONV_IDX):
        w = np.asarray(sd[f"features.{idx}.weight"])  # (out, in, kh, kw)
        b = np.asarray(sd[f"features.{idx}.bias"])
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)  # HWIO
        out[f"conv{i}_b"] = b.astype(np.float32)
    return out


def lpips_heads_to_npz_entries(source: str | None, uniform: bool) -> dict:
    out = {}
    if source:
        import torch

        sd = torch.load(source, map_location="cpu")
        for j, c in enumerate(TAP_CHANNELS):
            key = f"lin{j}.model.1.weight"
            w = np.asarray(sd[key]).reshape(-1)
            assert w.shape == (c,), (key, w.shape)
            out[f"lin{j}_w"] = w.astype(np.float32)
        out["uniform_heads"] = np.zeros((), np.int32)
    elif uniform:
        for j, c in enumerate(TAP_CHANNELS):
            out[f"lin{j}_w"] = np.full((c,), 1.0 / c, np.float32)
        out["uniform_heads"] = np.ones((), np.int32)
    else:
        raise SystemExit(
            "No --lpips head checkpoint given. The learned linear heads ARE "
            "the LPIPS metric; pass --uniform-heads only for smoke runs."
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vgg16", required=True,
                    help="torch checkpoint path or the literal 'torchvision'")
    ap.add_argument("--lpips", default=None,
                    help="LPIPS 'vgg' linear-heads checkpoint (lin{j}.model.1.weight)")
    ap.add_argument("--uniform-heads", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    entries = vgg16_to_npz_entries(load_vgg16_state(args.vgg16))
    entries.update(lpips_heads_to_npz_entries(args.lpips, args.uniform_heads))
    entries["shift"] = SHIFT
    entries["scale"] = SCALE
    np.savez(args.out, **entries)
    print(f"wrote {args.out}: 13 convs, 5 heads"
          f"{' (UNIFORM, not learned LPIPS)' if entries['uniform_heads'] else ''}")


if __name__ == "__main__":
    main(sys.argv[1:])
