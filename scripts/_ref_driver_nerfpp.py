"""Subprocess wrapper that runs the ACTUAL torch NeRF++ reference trainer
(`/root/reference/nerfplusplus/ddp_train_nerf.py:311`) on CPU, single rank,
for the NeRF++ trajectory-parity harness (scripts/ref_parity_nerfpp.py).

No reference code is copied or modified: the checkout is imported as-is and
`ddp_train_nerf(rank=0, args)` is invoked directly (replacing only the
`torch.multiprocessing.spawn` fan-out, `ddp_train_nerf.py:631-634`). The
process group is the reference's own gloo backend at world_size=1
(`:296-302`), which runs fine on CPU. Patches applied:

- stub modules absent from this image (wandb, configargparse, the empty
  superglue submodule),
- no-op `.cuda()`/`.to(rank)`/`torch.cuda.set_device` so the CUDA-written
  trainer runs on torch-cpu,
- replace `create_nerf`'s DDP wrapper with an identity nn.Module (child
  attribute named ``module`` so state-dict keys keep the ``module.``
  prefix). At world_size=1 DDP's gradient allreduce is the identity, so
  this changes nothing mathematically — it only avoids DDP's CUDA
  device_ids plumbing (`nerfplusplus/create_nerf.py:54-62`),
- tap `img2mse` in the trainer's namespace to record the per-level losses.

Usage: python _ref_driver_nerfpp.py <spec.json>
  spec = {"flags": [...argv for ddp_train_nerf...], "n_steps": N,
          "out_npz": path, "workdir": basedir}
Writes out_npz with: mse (cascade_level*N records, level-major per step),
and the final checkpoint's weights flattened as net0::/net1::/cam:: arrays.
"""
import glob
import json
import os
import sys
import types

import numpy as np


def _stub_modules():
    wandb = types.ModuleType("wandb")
    wandb.init = lambda **kw: None
    wandb.log = lambda *a, **k: None
    wandb.Image = lambda *a, **k: None
    wandb.run = None
    sys.modules["wandb"] = wandb

    import argparse

    ca = types.ModuleType("configargparse")

    class _ArgumentParser(argparse.ArgumentParser):
        def add_argument(self, *a, **k):
            k.pop("is_config_file", None)
            return super().add_argument(*a, **k)

        def format_values(self):
            return "<stubbed configargparse>"

    ca.ArgumentParser = _ArgumentParser
    sys.modules["configargparse"] = ca

    class _FakeMatching:
        """Constructible stand-in; camera runs call init_superglue
        (`ddp_train_nerf.py:343`) but never match (add_prd=-1, no weights)."""

        def __init__(self, *a, **k):
            pass

        def eval(self):
            return self

        def to(self, *a, **k):
            return self

    sg = types.ModuleType("thirdparty.superglue.models.matching")
    sg.Matching = _FakeMatching
    sys.modules["thirdparty.superglue.models"] = types.ModuleType(
        "thirdparty.superglue.models"
    )
    sys.modules["thirdparty.superglue.models.matching"] = sg


def _patch_cpu():
    import torch
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None
    torch.cuda.device_count = lambda: 1

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

    orig_module_to = nn.Module.to

    def module_to_cpu(self, *a, **k):
        if a and isinstance(a[0], int):
            a = ("cpu",) + a[1:]
        return orig_module_to(self, *a, **k)

    nn.Module.to = module_to_cpu

    # Factory calls like torch.ones(shape, device=rank) (e.g. the PRD loss,
    # model/ray_dist_loss.py:117) address a CUDA ordinal directly; rewrite
    # the device kwarg only — shapes/values/draw order untouched.
    def _cpu_factory(fn):
        def wrapped(*a, **k):
            dev = k.get("device")
            if isinstance(dev, int) or (isinstance(dev, str) and "cuda" in dev) or (
                isinstance(dev, torch.device) and dev.type == "cuda"
            ):
                k["device"] = "cpu"
            return fn(*a, **k)

        return wrapped

    for name in ("ones", "zeros", "empty", "full", "rand", "randn",
                 "linspace", "arange", "tensor", "eye", "ones_like",
                 "zeros_like", "rand_like"):
        setattr(torch, name, _cpu_factory(getattr(torch, name)))


def main():
    spec = json.load(open(sys.argv[1]))
    os.environ.setdefault("MPLBACKEND", "Agg")
    _stub_modules()
    _patch_cpu()

    os.chdir("/root/reference/nerfplusplus")
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/nerfplusplus")

    import torch
    import torch.nn as nn

    import create_nerf as ref_create_nerf

    class _IdentityDDP(nn.Module):
        """world_size=1 DDP stand-in; allreduce over one rank == identity."""

        def __init__(self, module, **kw):
            super().__init__()
            self.module = module

        def forward(self, *a, **k):
            return self.module(*a, **k)

    ref_create_nerf.DDP = _IdentityDDP

    import ddp_train_nerf

    mses = []
    orig_img2mse = ddp_train_nerf.img2mse

    def recording_img2mse(x, y):
        v = orig_img2mse(x, y)
        mses.append(float(v.detach()))
        return v

    ddp_train_nerf.img2mse = recording_img2mse

    renders = []
    if spec.get("record_renders"):
        # Tap the trainer's own deterministic eval renders (the i_img hook
        # fires at step 1 and at --i_img; each firing renders one val and
        # one train view via render_single_image, det sampling throughout).
        orig_rsi = ddp_train_nerf.render_single_image

        def recording_rsi(rank, ws, models, sampler, chunk, camera_model,
                          camera_idx=None):
            ret = orig_rsi(rank, ws, models, sampler, chunk, camera_model,
                           camera_idx)
            renders.append(ret[-1]["rgb"].detach().numpy())
            return ret

        ddp_train_nerf.render_single_image = recording_rsi

    if spec.get("matches_npz"):
        # PRD regime: replace the SuperGlue matcher (no weights in this
        # image) with precomputed reference-SIFT results; both trainers see
        # bit-identical correspondences. The pair is identified by image
        # content — the trainer passes the images by value
        # (`ddp_train_nerf.py:506-512`).
        import hashlib

        import imageio.v2 as imageio

        rgb_dir = spec["scene_rgb_dir"]
        idx_by_hash = {}
        for i, f in enumerate(sorted(os.listdir(rgb_dir))):
            img = np.asarray(imageio.imread(os.path.join(rgb_dir, f)))
            img = img.astype(np.float32) / 255.0
            idx_by_hash[hashlib.sha1(img.tobytes()).hexdigest()] = i
        raw = np.load(spec["matches_npz"])

        def stub_matcher(matcher, img0, img1, rank, margs):
            def ident(im):
                if hasattr(im, "numpy"):
                    im = im.numpy()
                h = hashlib.sha1(np.ascontiguousarray(im).tobytes()).hexdigest()
                return idx_by_hash[h]

            i, j = ident(img0), ident(img1)
            return [{
                k: torch.from_numpy(raw[f"{i}_{j}::{k}"])
                for k in ("kps0", "kps1", "matches")
            }]

        ddp_train_nerf.runSuperGlueSinglePair = stub_matcher

    parser = ddp_train_nerf.config_parser()
    args = parser.parse_args(spec["flags"])
    args.world_size = 1

    if spec.get("render_from_ckpt"):
        # EXPORT ROUND-TRIP mode: no training. Load the checkpoint OUR
        # exporter wrote (create_nerf's own reload glob over
        # basedir/expname/*.pth, `create_nerf.py:82-115`) and render one
        # train view exactly as ddp_test_nerf does
        # (`ddp_test_nerf.py:163-165`: render_single_image with
        # camera_idx=idx). Proves the reference can consume our .pth.
        rk = spec["render_from_ckpt"]
        ddp_train_nerf.setup(0, 1, args)
        ray_samplers, camera_info = ddp_train_nerf.load_data_split(
            args.datadir, args.scene, split=rk.get("split", "train"),
            try_load_min_depth=args.load_min_depth, args=args)
        start, models, camera_model = ddp_train_nerf.create_nerf(
            0, args, camera_info)
        idx = int(rk.get("idx", 0))
        ret = ddp_train_nerf.render_single_image(
            0, 1, models, ray_samplers[idx], args.chunk_size, camera_model,
            camera_idx=idx if camera_model is not None else None)
        np.savez(spec["out_npz"],
                 start=np.asarray(start),
                 rgb=ret[-1]["rgb"].detach().numpy())
        print(f"_ref_driver_nerfpp: render_from_ckpt start={start} "
              f"wrote {spec['out_npz']}")
        ddp_train_nerf.cleanup()
        return

    ddp_train_nerf.ddp_train_nerf(0, args)

    out = {"mse": np.asarray(mses, np.float64)}
    if renders:
        # per i_img firing: [val, train]; keep the final pair
        out["render::val"] = renders[-2]
        out["render::train"] = renders[-1]
    pths = sorted(
        glob.glob(os.path.join(spec["workdir"], "*", "model_*.pth")),
        key=lambda p: int(os.path.basename(p)[6:-4]),
    )
    if pths:
        ckpt = torch.load(pths[-1], map_location="cpu")
        for tag, key in (("net0", "net_0"), ("net1", "net_1"),
                         ("cam", "camera_model")):
            sd = ckpt.get(key) or {}
            for k, v in sd.items():
                out[f"{tag}::{k}"] = v.detach().numpy()
    np.savez(spec["out_npz"], **out)
    print(f"_ref_driver_nerfpp: wrote {spec['out_npz']} ({len(mses)} mse records)")


if __name__ == "__main__":
    main()
