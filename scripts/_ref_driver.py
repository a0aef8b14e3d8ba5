"""Subprocess wrapper that runs the ACTUAL torch reference trainer
(`/root/reference/NeRF/run_nerf.py:82`) on CPU for the trajectory-parity
harness (scripts/ref_parity.py).

No reference code is copied or modified: the checkout is imported as-is.
This wrapper only (a) stubs the third-party modules absent from this image
(wandb, piqa, torchvision, the empty superglue/nerfmm submodules), (b)
no-ops `.cuda()` so the CUDA-written trainer runs on torch-cpu, and (c)
taps `img2mse` to record the per-step photometric losses.

Usage: python _ref_driver.py <spec.json>
  spec = {"flags": [...argv for run_nerf...], "n_steps": N,
          "out_npz": path, "workdir": basedir}
Writes out_npz with: mse (2N: fine,coarse per step), and the final saved
checkpoint's weights flattened as fn::<key> / fine::<key> arrays.
"""
import glob
import json
import os
import sys
import types

import numpy as np


def _stub_modules():
    import torch
    import torch.nn as nn

    wandb = types.ModuleType("wandb")
    wandb.init = lambda **kw: None
    wandb.log = lambda *a, **k: None
    wandb.Image = lambda *a, **k: None
    wandb.run = None
    sys.modules["wandb"] = wandb

    class _ZeroMetric(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            return torch.zeros(())

    piqa = types.ModuleType("piqa")
    piqa_ssim = types.ModuleType("piqa.ssim")
    piqa_lpips = types.ModuleType("piqa.lpips")
    piqa_ssim.SSIM = _ZeroMetric
    piqa_lpips.LPIPS = _ZeroMetric
    piqa.ssim, piqa.lpips = piqa_ssim, piqa_lpips
    sys.modules.update(
        {"piqa": piqa, "piqa.ssim": piqa_ssim, "piqa.lpips": piqa_lpips}
    )

    import argparse

    ca = types.ModuleType("configargparse")

    class _ArgumentParser(argparse.ArgumentParser):
        def add_argument(self, *a, **k):
            k.pop("is_config_file", None)
            return super().add_argument(*a, **k)

    ca.ArgumentParser = _ArgumentParser
    sys.modules["configargparse"] = ca

    tv = types.ModuleType("torchvision")
    tv_tf = types.ModuleType("torchvision.transforms")
    tv.transforms = tv_tf
    sys.modules.update({"torchvision": tv, "torchvision.transforms": tv_tf})

    # Empty git-submodule dirs in the checkout: pre-seed the import chain.
    sg = types.ModuleType("thirdparty.superglue.models.matching")
    sg.Matching = object
    sys.modules["thirdparty.superglue.models"] = types.ModuleType(
        "thirdparty.superglue.models"
    )
    sys.modules["thirdparty.superglue.models.matching"] = sg
    at = types.ModuleType("thirdparty.nerfmm.utils.align_traj")
    at.align_ate_c2b_use_a2b = lambda *a, **k: a[-1]
    for name in ("thirdparty.nerfmm", "thirdparty.nerfmm.utils"):
        sys.modules[name] = types.ModuleType(name)
    sys.modules["thirdparty.nerfmm.utils.align_traj"] = at


def _patch_cpu():
    import torch
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    # n_gpus multiplies netchunk; 0 would make the chunked loop step by 0.
    torch.cuda.device_count = lambda: 1

    # The matcher path hardcodes .to(rank) with rank=0 (a CUDA ordinal).
    orig_to = torch.Tensor.to

    def to_cpu(self, *a, **k):
        if a and (
            isinstance(a[0], int)
            or (isinstance(a[0], str) and "cuda" in a[0])
            or (isinstance(a[0], torch.device) and a[0].type == "cuda")
        ):
            a = ("cpu",) + a[1:]
        if isinstance(k.get("device"), (int,)) or (
            isinstance(k.get("device"), str) and "cuda" in k.get("device", "")
        ):
            k["device"] = "cpu"
        return orig_to(self, *a, **k)

    torch.Tensor.to = to_cpu

    # Modern imageio dropped the ignoregamma kwarg the reference passes.
    import imageio

    orig_imread = imageio.imread

    def imread(uri, *a, **k):
        k.pop("ignoregamma", None)
        return orig_imread(uri, *a, **k)

    imageio.imread = imread


def main():
    spec = json.load(open(sys.argv[1]))
    os.environ.setdefault("MPLBACKEND", "Agg")
    _stub_modules()
    _patch_cpu()

    os.chdir("/root/reference/NeRF")
    sys.path.insert(0, "/root/reference/model")  # plain `from prd_evaluation ...`
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/NeRF")
    sys.argv = ["run_nerf.py"] + list(spec["flags"])

    import time

    import run_nerf

    mses, stamps = [], []
    orig_img2mse = run_nerf.img2mse

    def recording_img2mse(x, y):
        v = orig_img2mse(x, y)
        mses.append(float(v.detach()))
        stamps.append(time.perf_counter())
        return v

    run_nerf.img2mse = recording_img2mse

    renders = []
    if spec.get("record_renders"):
        # Tap the end-of-training trainset render (run_nerf.py:957-987,
        # render_path over the train poses with render_kwargs_train —
        # deterministic at perturb=0 / raw_noise_std=0). Only the
        # no-camera branch completes (the camera branch crashes upstream
        # in the reference itself, see the except below).
        orig_rp = run_nerf.render_path

        def recording_render_path(*a, **k):
            rgbs, disps = orig_rp(*a, **k)
            renders.append(np.asarray(rgbs[0].detach()
                                      if hasattr(rgbs[0], "detach")
                                      else rgbs[0]))
            return rgbs, disps

        run_nerf.render_path = recording_render_path

    n = int(spec["n_steps"])
    try:
        run_nerf.train()
    except Exception as e:
        # The reference's END-OF-TRAINING logging block crashes on some
        # configurations (e.g. camera-model runs hit render.py:44's
        # np.where(list == int) with the hardcoded `i_train = [0]` list,
        # run_nerf.py:909). By then the training loop has finished and the
        # final checkpoint is saved, so tolerate it iff all per-step
        # records exist — otherwise re-raise.
        import glob as _glob

        if len(mses) < 2 * n or not _glob.glob(
            os.path.join(spec["workdir"], "*", "*.tar")
        ):
            raise
        print(f"_ref_driver: post-training logging failed ({type(e).__name__}: "
              f"{e}); training records complete, continuing")
    out = {
        "mse": np.asarray(mses[: 2 * n], np.float64),
        "stamps": np.asarray(stamps[: 2 * n], np.float64),
    }
    if renders:
        out["render::train0"] = renders[-1]

    tars = sorted(glob.glob(os.path.join(spec["workdir"], "*", "*.tar")))
    if tars:
        import torch

        ckpt = torch.load(tars[-1], map_location="cpu")
        for tag, key in (("fn", "network_fn_state_dict"),
                         ("fine", "network_fine_state_dict"),
                         ("cam", "camera_model")):
            sd = ckpt.get(key) or {}
            for k, v in sd.items():
                out[f"{tag}::{k}"] = v.detach().numpy()
    np.savez(spec["out_npz"], **out)
    print(f"_ref_driver: wrote {spec['out_npz']} ({len(mses)} mse records)")


if __name__ == "__main__":
    main()
