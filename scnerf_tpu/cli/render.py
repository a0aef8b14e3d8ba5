"""Render / evaluation CLI.

Reference equivalents: ``run_nerf.py --render_only`` (``render_path`` +
metric dump, ``/root/reference/NeRF/run_nerf.py:232-283,748-800``) and
``ddp_test_nerf.py``. Restores the latest checkpoint, renders the chosen
split or the spiral/spherical render path, writes PNGs + an mp4, and prints
PSNR/SSIM (+PRD when a match cache exists).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="scnerf-tpu renderer")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--split", type=str, default="test", choices=["test", "train", "path"])
    parser.add_argument("--render_splits", type=str, default=None,
                        help="comma list, e.g. 'train,test' — the reference "
                             "ddp_test_nerf flag; renders each in turn")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--max_views", type=int, default=None)
    args, unknown = parser.parse_known_args(argv)

    if args.render_splits:
        rc = 0
        for s in args.render_splits.split(","):
            s = s.strip()
            if s in ("validation", "val"):
                s = "test"  # held-out naming differs per dataset family
            sub = ["--config", args.config, "--split", s]
            if args.ckpt_dir:
                sub += ["--ckpt_dir", args.ckpt_dir]
            if args.max_views is not None:
                sub += ["--max_views", str(args.max_views)]
            rc = rc or main(sub)
        return rc

    from scnerf_tpu.core.config import load_experiment
    from scnerf_tpu.tools.video import array_to_video
    from scnerf_tpu.train.checkpoint import restore_checkpoint
    from scnerf_tpu.train.driver import (
        build_experiment,
        evaluate_test_views,
        render_image,
    )

    cfg = load_experiment(args.config)
    expdir = os.path.join(cfg.logging.basedir, cfg.logging.expname)
    ckpt_dir = args.ckpt_dir or os.path.join(expdir, "ckpts")
    out_dir = args.out or os.path.join(expdir, f"render_{args.split}")
    os.makedirs(out_dir, exist_ok=True)

    if cfg.dataset.dataset_type == "nerfpp":
        return _render_nerfpp(cfg, expdir, ckpt_dir, out_dir, args)

    exp = build_experiment(cfg, expdir)
    restored = restore_checkpoint(ckpt_dir, exp.state)
    if restored is not None:
        exp.state = restored
        print(f"[render] restored step {int(restored.step)} from {ckpt_dir}")
    else:
        print("[render] no checkpoint found; rendering with initial params")

    import imageio.v2 as imageio

    if args.split == "train":
        # End-of-training trainset render with the learned camera
        # (run_nerf.py:904-1043): per train image, learned extrinsics.
        from scnerf_tpu.camera.model import get_extrinsic
        from scnerf_tpu.losses.photometric import img2mse, mse2psnr

        psnrs = []
        views = exp.i_train[: args.max_views] if args.max_views else exp.i_train
        for n, idx in enumerate(views):
            cam = exp.state.params.get("camera")
            if cam is not None:
                ci = int(np.where(exp.i_train == idx)[0][0])
                c2w = np.asarray(get_extrinsic(cam, ci))
            else:
                c2w = exp.noisy_poses[int(idx)]
            out = render_image(exp, c2w)
            import jax.numpy as jnp

            mse = float(img2mse(jnp.asarray(out["rgb"]), jnp.asarray(exp.images[int(idx)])))
            psnrs.append(float(mse2psnr(jnp.asarray(mse))))
            imageio.imwrite(
                os.path.join(out_dir, f"{n:03d}.png"),
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8),
            )
        print(f"[eval] trainset psnr={np.mean(psnrs):.2f} views={len(psnrs)}")
    elif args.split == "test":
        results = evaluate_test_views(exp, max_views=args.max_views)
        from scnerf_tpu.train.driver import evaluate_prd_split

        results.update(evaluate_prd_split(exp, mode="test"))
        extra = "".join(
            f" {k}={results[k]:.4f}" for k in ("lpips", "prd_test") if k in results
        )
        print(f"[eval] psnr={results['psnr']:.2f} ssim={results['ssim']:.4f} "
              f"views={results['n_views']}{extra}")
        for n, idx in enumerate(exp.i_test[: args.max_views]):
            from scnerf_tpu.train.driver import aligned_eval_extrinsic

            c2w = (
                aligned_eval_extrinsic(exp, int(idx))
                if exp.state.params.get("camera") is not None
                else exp.gt_poses[int(idx)]
            )
            out = render_image(exp, c2w)
            imageio.imwrite(
                os.path.join(out_dir, f"{n:03d}.png"),
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8),
            )
    else:
        # Spiral / spherical render path written as video.
        frames = []
        # Re-load the render path (LLFF spiral (R,3,5) / blender spherical).
        if cfg.dataset.dataset_type == "blender":
            from scnerf_tpu.data.blender import pose_spherical

            path = [pose_spherical(a, -30.0, 4.0) for a in np.linspace(-180, 180, 41)[:-1]]
        else:
            from scnerf_tpu.data.llff import load_llff

            path = load_llff(cfg.dataset.datadir, factor=cfg.dataset.factor).render_poses
            path = [np.concatenate([p[:3, :4], [[0, 0, 0]]], 0) for p in path]
            path = [np.concatenate([p, [[0], [0], [0], [1]]], 1)[:4, :4] for p in path]
        for n, c2w in enumerate(path):
            out = render_image(exp, np.asarray(c2w), camera_rays=True)
            frames.append(out["rgb"])
            imageio.imwrite(
                os.path.join(out_dir, f"{n:03d}.png"),
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8),
            )
        array_to_video(np.stack(frames), os.path.join(out_dir, "video.mp4"))
    print(f"[render] wrote {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def _render_nerfpp(cfg, expdir, ckpt_dir, out_dir, args):
    """NeRF++ split rendering + metrics (the ddp_test_nerf.py role): rgb,
    fg/bg rgb, colorized depth dumps and a summary file."""
    import imageio.v2 as imageio

    from scnerf_tpu.core.imaging import colorize_depth, to8b
    from scnerf_tpu.train.checkpoint import restore_checkpoint
    from scnerf_tpu.train.nerfpp_driver import (
        build_nerfpp_experiment,
        evaluate_nerfpp,
        render_nerfpp_image,
    )

    exp = build_nerfpp_experiment(cfg, expdir)
    restored = restore_checkpoint(ckpt_dir, exp.state)
    if restored is not None:
        exp.state = restored
        print(f"[render] restored step {int(restored.step)}")
    from scnerf_tpu.train.nerfpp_driver import _held_out_data

    data = _held_out_data(exp) if args.split != "train" else exp.train_data
    res = evaluate_nerfpp(exp, max_views=args.max_views, data=data)
    extra = f" lpips={res['lpips']:.4f}" if "lpips" in res else ""
    print(f"[eval] psnr={res['psnr']:.2f} ssim={res['ssim']:.4f} "
          f"views={res['n_views']} split={res['split']}{extra}")
    for i in range(res["n_views"]):
        # dump the SAME views (same ray path) the metrics were computed on:
        # held-out poses via the learned K, train indices via the full
        # learned camera (what evaluate_nerfpp renders).
        if data is not None and data is not exp.train_data:
            out = render_nerfpp_image(exp, c2w=data.poses[i],
                                      K=data.intrinsics[i],
                                      hw=(data.H, data.W))
        else:
            out = render_nerfpp_image(exp, img_idx=i)
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}.png"), to8b(out["rgb"]))
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}_fg.png"), to8b(out["fg_rgb"]))
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}_bg.png"), to8b(out["bg_rgb"]))
        imageio.imwrite(
            os.path.join(out_dir, f"{i:03d}_depth.png"),
            to8b(colorize_depth(out["fg_depth"])),
        )
    with open(os.path.join(out_dir, f"{cfg.logging.expname}.txt"), "w") as f:
        f.write(f"psnr {res['psnr']:.4f}\nssim {res['ssim']:.4f}\n")
        if "lpips" in res:
            f.write(f"lpips {res['lpips']:.4f}\n")
    print(f"[render] wrote {out_dir}")
    return 0
