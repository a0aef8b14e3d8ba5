"""Training CLI.

Reference-equivalent entry point (``python run_nerf.py --config fern.txt``):

    python -m scnerf_tpu.cli.train --config configs/fern.txt [--key value ...]

Any reference flag can be overridden on the command line; unknown flags warn
instead of failing (the two reference parsers had divergent surfaces).
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_cli(argv=None):
    parser = argparse.ArgumentParser(description="scnerf-tpu trainer")
    parser.add_argument("--config", type=str, default=None, help="reference-style txt config")
    parser.add_argument("--steps", type=int, default=None, help="override N_iters")
    args, unknown = parser.parse_known_args(argv)
    overrides = {}
    k = None
    for tok in unknown:
        if tok.startswith("--"):
            k = tok[2:]
            overrides[k] = True  # bare flag
        elif k is not None:
            from scnerf_tpu.core.config import _parse_value

            overrides[k] = _parse_value(tok)
            k = None
    return args, overrides


def main(argv=None):
    args, overrides = parse_cli(argv)
    from scnerf_tpu.core.config import _truthy, load_experiment

    # Reference train-binary modes (config_argparse.py:65-68;
    # run_nerf.py:247-283): --render_only renders instead of training,
    # --render_test picks the test split over the spiral render path.
    if _truthy(overrides.pop("render_only", False)):
        from scnerf_tpu.cli.render import main as render_main

        split = "test" if _truthy(overrides.pop("render_test", False)) else "path"
        return render_main(["--config", args.config, "--split", split])
    overrides.pop("render_test", None)

    cfg = load_experiment(args.config, overrides)
    expdir = os.path.join(cfg.logging.basedir, cfg.logging.expname)
    os.makedirs(expdir, exist_ok=True)

    if cfg.dataset.dataset_type in ("llff", "blender"):
        from scnerf_tpu.train.driver import build_experiment, evaluate_test_views, train_loop

        exp = build_experiment(cfg, expdir)
        n_steps = args.steps if args.steps is not None else cfg.optim.N_iters
        state, metrics = train_loop(exp, n_steps, ckpt_dir=os.path.join(expdir, "ckpts"))
        results = evaluate_test_views(exp, max_views=3)
        print(f"[eval] psnr={results['psnr']:.2f} ssim={results['ssim']:.4f}")
        if exp.logger:
            exp.logger.log(int(state.step), {"final_" + k: v for k, v in results.items()})
            exp.logger.close()
    elif cfg.dataset.dataset_type == "nerfpp":
        from scnerf_tpu.train.nerfpp_driver import run_nerfpp_training

        run_nerfpp_training(cfg, expdir, n_steps=args.steps)
    else:
        print(f"unknown dataset_type {cfg.dataset.dataset_type}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
