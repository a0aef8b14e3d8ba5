"""Export CLI: checkpoint -> portable serving artifact.

``python -m scnerf_tpu.cli.export --config cfg.txt --out model.jaxexport``

Restores the latest checkpoint of the experiment (either pipeline), builds
the fixed-shape eval-semantics serve function (:mod:`scnerf_tpu.serve`),
serializes it with ``jax.export`` (weights baked in as constants), and
writes a sibling ``.json`` with the artifact's calling convention. The
reference has no equivalent — deployment there means re-running
``run_nerf.py --render_only`` / ``ddp_test_nerf.py`` with the training
code present; this artifact needs only jax.
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="scnerf-tpu serving export")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--out", type=str, default=None,
                        help="artifact path (default <expdir>/serve.jaxexport)")
    parser.add_argument("--batch", type=int, default=8192,
                        help="fixed ray-batch size compiled into the artifact")
    args, _ = parser.parse_known_args(argv)

    from scnerf_tpu.core.config import load_experiment
    from scnerf_tpu.serve import export_serving_fn
    from scnerf_tpu.train.checkpoint import restore_checkpoint

    cfg = load_experiment(args.config)
    expdir = os.path.join(cfg.logging.basedir, cfg.logging.expname)
    ckpt_dir = args.ckpt_dir or os.path.join(expdir, "ckpts")
    out_path = args.out or os.path.join(expdir, "serve.jaxexport")

    if cfg.dataset.dataset_type == "nerfpp":
        from scnerf_tpu.serve import make_nerfpp_serve_fn, nerfpp_serve_specs
        from scnerf_tpu.train.nerfpp_driver import build_nerfpp_experiment

        exp = build_nerfpp_experiment(cfg, expdir)
        restored = restore_checkpoint(ckpt_dir, exp.state)
        if restored is not None:
            exp.state = restored
        step = int(exp.state.step)
        fn = make_nerfpp_serve_fn(
            exp.state.params["levels"], exp.model_cfg, exp.render_cfg
        )
        specs = nerfpp_serve_specs(args.batch)
        meta = {
            "pipeline": "nerfpp",
            "inputs": ["ray_o (B,3) f32", "ray_d (B,3) f32", "min_depth (B,) f32"],
            "outputs": ["rgb", "fg_depth", "bg_lambda"],
        }
    else:
        from scnerf_tpu.serve import make_nerf_serve_fn, nerf_serve_specs
        from scnerf_tpu.train.driver import build_experiment

        exp = build_experiment(cfg, expdir)
        restored = restore_checkpoint(ckpt_dir, exp.state)
        if restored is not None:
            exp.state = restored
        step = int(exp.state.step)
        ndc = None
        if exp.train_cfg.use_ndc:
            camera = exp.state.params.get("camera")
            if camera is not None:
                from scnerf_tpu.camera.model import get_intrinsic

                K = get_intrinsic(camera)
                fx, fy = float(K[0, 0]), float(K[1, 1])
            else:
                fx = fy = float(exp.noisy_focal)
            ndc = (exp.H, exp.W, fx, fy)
        fn = make_nerf_serve_fn(
            exp.state.params, exp.model_cfg, exp.render_cfg, ndc=ndc
        )
        specs = nerf_serve_specs(args.batch)
        meta = {
            "pipeline": "nerf",
            "inputs": ["rays_o (B,3) f32", "rays_d (B,3) f32",
                       "near (B,) f32", "far (B,) f32"],
            "outputs": ["rgb", "depth", "acc", "disp"],
            "ndc": list(ndc) if ndc else None,
        }

    data = export_serving_fn(fn, specs, path=out_path)
    meta.update(batch=args.batch, step=step, bytes=len(data),
                expname=cfg.logging.expname)
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[export] step {step} -> {out_path} ({len(data) / 1e6:.1f} MB, "
          f"batch {args.batch})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
