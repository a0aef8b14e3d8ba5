"""Driver + config-system tests: reference txt configs parse into the typed
tree; the full loop (build -> train -> eval) runs on synthetic datasets."""
import json
import os

import numpy as np
import pytest

from scnerf_tpu.core.config import (
    experiment_from_flags,
    load_experiment,
    parse_config_file,
)


class TestConfig:
    def test_parse_reference_style_txt(self, tmp_path):
        txt = """
        expname = fern_ours
        datadir = ./data/nerf_llff_data/fern
        dataset_type = llff
        factor = 8
        llffhold = 8
        N_rand = 1024
        N_samples = 64
        N_importance = 64
        use_viewdirs = True
        raw_noise_std = 1e0
        camera_model = pinhole_rot_noise_10k_rayo_rayd
        ray_loss_type = proj_ray_dist
        ray_dist_loss_weight = 0.0001
        add_ie = 200000
        add_od = 400000
        add_prd = 600000
        grid_size = 10
        use_custom_optim = True
        non_linear_weight_decay = 0.1
        lrate_decay = 250
        """
        p = tmp_path / "fern.txt"
        p.write_text(txt)
        flags = parse_config_file(str(p))
        assert flags["N_rand"] == 1024
        assert flags["raw_noise_std"] == 1.0
        cfg = load_experiment(str(p), warn=lambda *a: None)
        assert cfg.logging.expname == "fern_ours"
        assert cfg.dataset.dataset_type == "llff"
        assert cfg.sampling.N_rand == 1024
        assert cfg.camera.camera_model == "pinhole_rot_noise_10k_rayo_rayd"
        assert cfg.camera.use_camera and not cfg.camera.use_distortion
        assert cfg.camera.add_od == 400000
        assert cfg.optim.non_linear_weight_decay == 0.1

    def test_nerfpp_flags(self):
        cfg = experiment_from_flags(
            {
                "dataset_type": "nerfpp",
                "cascade_samples": "64,128",
                "chunk_size": 4096,
                "max_freq_log2": 10,
                "normalize_factor": 3.0,
                "camera_model": "pinhole_rot_noise_10k_rayo_rayd_dist",
            },
            warn=lambda *a: None,
        )
        assert cfg.model.cascade_samples == (64, 128)
        assert cfg.sampling.chunk == 4096
        assert cfg.dataset.normalize_factor == 3.0
        assert cfg.camera.use_distortion

    def test_unknown_flags_warn_not_fail(self):
        warnings = []
        cfg = experiment_from_flags({"bogus_flag": 3}, warn=lambda m: warnings.append(m))
        assert len(warnings) == 1

    def test_json_snapshot_roundtrip(self):
        cfg = experiment_from_flags({"N_rand": 77}, warn=lambda *a: None)
        data = json.loads(cfg.to_json())
        assert data["sampling"]["N_rand"] == 77


@pytest.mark.slow
class TestDriverEndToEnd:
    def test_blender_driver_with_camera(self, tmp_path):
        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical

        rng = np.random.RandomState(0)
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
                frames.append(
                    {"file_path": f"./{split}/r_{i}", "transform_matrix": pose.tolist()}
                )
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames})
            )

        flags = {
            "dataset_type": "blender",
            "datadir": str(root),
            "white_bkgd": True,
            "N_rand": 64,
            "N_samples": 8,
            "N_importance": 8,
            "netdepth": 3,
            "netwidth": 32,
            "multires": 4,
            "multires_views": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "ray_loss_type": "none",
            "i_weights": 10,
            "i_print": 5,
            "expname": "t",
            "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import (
            build_experiment,
            evaluate_test_views,
            train_loop,
        )

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        expdir = str(tmp_path / "logs" / "t")
        os.makedirs(expdir, exist_ok=True)
        exp = build_experiment(cfg, expdir)
        state, metrics = train_loop(exp, n_steps=12, ckpt_dir=str(tmp_path / "ck"))
        assert int(state.step) == 12
        assert np.isfinite(float(metrics["loss"]))
        # checkpoint written at step 10
        from scnerf_tpu.train.checkpoint import list_checkpoint_steps

        assert list_checkpoint_steps(str(tmp_path / "ck")) == [10]
        # metrics.jsonl written
        lines = open(os.path.join(expdir, "metrics.jsonl")).read().strip().splitlines()
        assert len(lines) >= 2
        res = evaluate_test_views(exp)
        assert res["n_views"] == 1 and np.isfinite(res["psnr"]) and -1 <= res["ssim"] <= 1

    def test_nerfpp_driver(self, tmp_path):
        from tests.test_data import write_png

        rng = np.random.RandomState(3)
        root = tmp_path / "tat"
        H = W = 16
        for split, n in [("train", 3)]:
            for sub in ["rgb", "intrinsics", "pose"]:
                os.makedirs(root / split / sub, exist_ok=True)
            for i in range(n):
                write_png(root / split / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
                K = np.eye(4)
                K[0, 0] = K[1, 1] = 14.0
                K[0, 2], K[1, 2] = W / 2, H / 2
                (root / split / "intrinsics" / f"{i:05d}.txt").write_text(
                    " ".join(map(str, K.reshape(-1)))
                )
                pose = np.eye(4)
                pose[:3, 3] = [0.05 * i, 0.0, -0.3]
                (root / split / "pose" / f"{i:05d}.txt").write_text(
                    " ".join(map(str, pose.reshape(-1)))
                )
        flags = {
            "dataset_type": "nerfpp",
            "datadir": str(root),
            "N_rand": 32,
            "cascade_samples": "8,8",
            "cascade_level": 2,
            "netdepth": 3,
            "netwidth": 32,
            "max_freq_log2": 4,
            "max_freq_log2_viewdirs": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "autoexpo": True,
            "i_weights": 1000,
            "i_print": 2,
            "expname": "tt",
            "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.nerfpp_driver import run_nerfpp_training

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        expdir = str(tmp_path / "logs" / "tt")
        os.makedirs(expdir, exist_ok=True)
        state, metrics = run_nerfpp_training(cfg, expdir, n_steps=6)
        assert int(state.step) == 6
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestRenderCli:
    def test_nerfpp_render_cli(self, tmp_path, monkeypatch):
        """Train 2 steps via the train CLI, then render via the render CLI."""
        from tests.test_data import write_png

        rng = np.random.RandomState(5)
        root = tmp_path / "scene"
        H = W = 16
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4); K[0, 0] = K[1, 1] = 14.0; K[0, 2], K[1, 2] = W / 2, H / 2
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1))))
            pose = np.eye(4); pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        cfgfile = tmp_path / "cfg.txt"
        cfgfile.write_text(f"""
        dataset_type = nerfpp
        datadir = {root}
        N_rand = 16
        cascade_samples = 4,4
        cascade_level = 2
        netdepth = 2
        netwidth = 16
        max_freq_log2 = 2
        max_freq_log2_viewdirs = 1
        camera_model = pinhole_rot_noise_10k_rayo_rayd
        grid_size = 4
        i_weights = 2
        i_print = 1
        expname = rcli
        basedir = {tmp_path / "logs"}
        """)
        from scnerf_tpu.cli.train import main as train_main
        from scnerf_tpu.cli.render import main as render_main

        assert train_main(["--config", str(cfgfile), "--steps", "2"]) == 0
        assert render_main(["--config", str(cfgfile), "--max_views", "1"]) == 0
        out_dir = tmp_path / "logs" / "rcli" / "render_test"
        assert (out_dir / "000.png").exists()
        assert (out_dir / "000_depth.png").exists()
        assert (out_dir / "rcli.txt").exists()


class TestReferenceConfigCompatibility:
    """Every published reference config txt must parse through the shim."""

    REF_CONFIG_DIRS = [
        "/root/reference/NeRF/configs/llff_data",
        "/root/reference/NeRF/configs/blender",
        "/root/reference/nerfplusplus/configs/tanks_and_temples",
    ]

    def _iter_configs(self):
        for d in self.REF_CONFIG_DIRS:
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".txt"):
                    yield os.path.join(d, f)

    def test_all_reference_configs_parse(self):
        import glob

        n = 0
        unknown = {}
        for path in self._iter_configs():
            warnings = []
            cfg = load_experiment(path, warn=lambda m: warnings.append(m))
            assert cfg.sampling.N_rand > 0
            for w in warnings:
                unknown[w.split(":")[1].split("=")[0].strip()] = True
            n += 1
        # also every nerfpp fisheye config if present
        for path in glob.glob("/root/reference/nerfplusplus/configs/fisheye*/*.txt"):
            cfg = load_experiment(path, warn=lambda *a: None)
            n += 1
        assert n > 0, "no reference configs found"

    def test_nerfpp_decay_steps_units(self, tmp_path):
        """The reference's lrate_decay_steps flag is in THOUSANDS
        (ddp_train_nerf.py:387); the shim must convert. The published
        fisheyenerf_high configs set 800 -> 800,000 direct steps."""
        p = tmp_path / "c.txt"
        p.write_text("datadir = /x\ndataset_type = nerfpp\n"
                     "lrate_decay_steps = 800\n")
        cfg = load_experiment(str(p), warn=lambda *a: None)
        assert cfg.optim.lrate_decay_steps == 800_000
        ref = "/root/reference/nerfplusplus/configs/fisheyenerf_high/chairs_ours.txt"
        if os.path.exists(ref):
            cfg = load_experiment(ref, warn=lambda *a: None)
            assert cfg.optim.lrate_decay_steps == 800_000

    def test_nerfpp_autoexpo_lambda_default(self):
        """Reference default lambda_autoexpo = 1.0 (config_argparser.py:48)."""
        from scnerf_tpu.core.config import ExperimentConfig
        from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig

        assert ExperimentConfig().model.lambda_autoexpo == 1.0
        assert NerfPPTrainConfig().lambda_autoexpo == 1.0

    def test_fern_reference_values(self):
        path = "/root/reference/NeRF/configs/llff_data/fern.txt"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        cfg = load_experiment(path, warn=lambda *a: None)
        assert cfg.dataset.dataset_type == "llff"
        assert cfg.sampling.N_rand == 1024
        assert cfg.sampling.N_samples == 64
        assert cfg.sampling.raw_noise_std == 1.0
        assert cfg.model.use_viewdirs


@pytest.mark.slow
class TestDeviceSamplingDriver:
    def test_driver_with_device_sampling(self, tmp_path):
        import json
        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical

        root = tmp_path / "ds"
        H = W = 16
        for split, n in [("train", 3), ("val", 1), ("test", 1)]:
            os.makedirs(root / split, exist_ok=True)
            frames = []
            for i in range(n):
                pose = np.array(pose_spherical(i * 40.0, -30.0, 4.0))
                img = np.zeros((H, W, 4)); img[4:12, 4:12, :3] = [1, .4, .2]; img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}", "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames}))
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import build_experiment, train_loop

        cfg = experiment_from_flags({
            "dataset_type": "blender", "datadir": str(root), "white_bkgd": True,
            "N_rand": 32, "N_samples": 8, "N_importance": 8, "netdepth": 3,
            "netwidth": 32, "multires": 4, "multires_views": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "device_sampling": True, "no_batching": True,
            "i_print": 100, "i_weights": 1000,
            "expname": "dsamp", "basedir": str(tmp_path / "logs"),
        }, warn=lambda *a: None)
        exp = build_experiment(cfg, None)
        assert exp.device_step is not None
        state, metrics = train_loop(exp, n_steps=5)
        assert int(state.step) == 5
        assert np.isfinite(float(metrics["loss"]))


class TestFisheyeConfig:
    def test_fisheye_preset_maps_to_distortion_camera(self):
        cfg = load_experiment("configs/fisheyenerf/globe_ours.txt", warn=lambda *a: None)
        assert cfg.camera.use_camera and cfg.camera.use_distortion
        assert cfg.dataset.normalize_factor == 3.0
        assert cfg.model.cascade_samples == (64, 128)
        assert cfg.camera.add_radial == 800001

    def test_reference_fisheye_camera_model_name(self):
        # the reference fisheye configs use `camera_model = fisheye`
        cfg = experiment_from_flags({"camera_model": "fisheye"}, warn=lambda *a: None)
        assert cfg.camera.use_camera and cfg.camera.use_distortion


class TestPrdSplitEvaluation:
    """End-to-end driver wiring of the GT-filtered val/test PRD protocol
    (round-1 VERDICT item 3): build a real experiment, inject synthetic
    correspondences between the test views, and run evaluate_prd_split."""

    def _build_exp(self, tmp_path):
        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical

        root = tmp_path / "ds"
        H = W = 16
        # test views only 12 deg apart so they would also pass the
        # reference's 30-deg pairing feasibility check.
        angles = {"train": [0.0, 40.0, 80.0], "val": [120.0], "test": [10.0, 22.0, 34.0]}
        for split, angs in angles.items():
            os.makedirs(root / split, exist_ok=True)
            frames = []
            for i, ang in enumerate(angs):
                pose = np.array(pose_spherical(ang, -30.0, 4.0))
                img = np.zeros((H, W, 4))
                img[4:12, 4:12, :3] = [1.0, 0.4, 0.2]
                img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}",
                               "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames})
            )
        flags = {
            "dataset_type": "blender", "datadir": str(root), "N_rand": 32,
            "N_samples": 4, "N_importance": 0, "netdepth": 2, "netwidth": 16,
            "multires": 2, "multires_views": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "testskip": 1,
            "expname": "prdsplit", "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import build_experiment

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        return build_experiment(cfg, None)

    @staticmethod
    def _project_opengl(pts, c2w, K):
        """Pixel-index coords of world pts through an OPENGL camera (the
        inverse of rays_no_camera/pixels_to_rays with pixel_offset 0)."""
        cam = (pts - c2w[:3, 3]) @ c2w[:3, :3]
        u = K[0, 2] + K[0, 0] * cam[:, 0] / (-cam[:, 2])
        v = K[1, 2] - K[1, 1] * cam[:, 1] / (-cam[:, 2])
        return np.stack([u, v], -1).astype(np.float32)

    def test_gt_filtered_val_prd(self, tmp_path):
        from scnerf_tpu.matching.provider import PairMatches, PrecomputedMatches
        from scnerf_tpu.train.driver import evaluate_prd_split

        exp = self._build_exp(tmp_path)
        assert len(exp.i_test) == 3
        rng = np.random.RandomState(11)
        pts = rng.randn(48, 3) * 0.25  # near the origin, seen by all views
        gt_E = exp.gt_poses[exp.i_test]
        K = exp.gt_intrinsic

        cache = PrecomputedMatches()
        pair_list = np.array([[0, 1], [1, 2]])
        for i, j in pair_list:
            k0 = self._project_opengl(pts, gt_E[i], K)
            k1 = self._project_opengl(pts, gt_E[j], K)
            k1c = k1.copy()
            k1c[:8] += 30.0  # bad matches the GT filter must drop
            cache.put(int(i), int(j), PairMatches(k0, k1c))
        exp.eval_pair_list, exp.eval_match_cache = pair_list, cache

        res = evaluate_prd_split(exp, mode="val")
        assert "prd_val" in res
        # camera initialised at GT (zero injected noise) -> near-zero PRD;
        # unfiltered corrupt matches would clamp at threshold 5 and push the
        # mean above 0.8 (8/48 * 5).
        assert res["prd_val"] < 0.2, res

        # test mode runs the same protocol
        res_t = evaluate_prd_split(exp, mode="test")
        assert res_t["prd_test"] < 0.2

    def test_too_few_views_is_empty(self, tmp_path):
        from scnerf_tpu.train.driver import evaluate_prd_split

        exp = self._build_exp(tmp_path)
        assert evaluate_prd_split(exp, mode="val", split=exp.i_test[:1]) == {}


class TestNerfPPPrdEvaluation:
    def test_prd_eval_with_injected_matches(self, tmp_path):
        """evaluate_nerfpp_prd end-to-end on a built experiment with
        synthetic geometric correspondences (ddp_test_nerf.py:32-116)."""
        from tests.test_data import write_png

        rng = np.random.RandomState(5)
        root = tmp_path / "tat"
        H = W = 24
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        poses = []
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 20.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1)))
            )
            pose = np.eye(4)
            pose[:3, 3] = [0.1 * i - 0.05, 0.0, -0.4]
            poses.append(pose)
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1)))
            )
        flags = {
            "dataset_type": "nerfpp", "datadir": str(root), "N_rand": 16,
            "cascade_samples": "4,4", "cascade_level": 2, "netdepth": 2,
            "netwidth": 16, "max_freq_log2": 2, "max_freq_log2_viewdirs": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "expname": "ppprd", "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.nerfpp_driver import (
            build_nerfpp_experiment,
            evaluate_nerfpp_prd,
        )
        from scnerf_tpu.matching.provider import PairMatches, PrecomputedMatches

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        exp = build_nerfpp_experiment(cfg, None)

        # Points in front of both OPENCV cameras (z up to ~0.3 world, cams
        # at z=-0.4 looking +z).
        pts = rng.randn(32, 3) * np.array([0.05, 0.05, 0.05]) + [0, 0, 0.3]

        def project(pose, K):
            cam = (pts - pose[:3, 3]) @ pose[:3, :3]
            pix = cam @ np.array(K)[:3, :3].T
            return (pix[:, :2] / pix[:, 2:3] - 0.5).astype(np.float32)

        K = np.eye(4); K[0, 0] = K[1, 1] = 20.0; K[0, 2], K[1, 2] = W / 2, H / 2
        cache = PrecomputedMatches()
        cache.put(0, 1, PairMatches(project(poses[0], K), project(poses[1], K)))
        exp.pair_list, exp.match_cache = np.array([[0, 1]]), cache

        res = evaluate_nerfpp_prd(exp)
        assert "prd" in res
        assert res["prd"] < 2.0, res  # GT-consistent matches -> small PRD


class TestOwnConfigPresets:
    def test_all_repo_presets_parse(self):
        """Every shipped preset (LLFF/Blender/T&T/fisheye/fisheye_high/lf)
        parses with zero unknown-flag warnings."""
        import glob

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(glob.glob(os.path.join(repo, "configs", "*", "*.txt")))
        assert len(paths) >= 30, paths
        for path in paths:
            warnings = []
            cfg = load_experiment(path, warn=lambda m: warnings.append(m))
            assert cfg.sampling.N_rand > 0, path
            assert not warnings, (path, warnings)

    def test_launcher_scripts_reference_real_configs(self):
        """Every main_table launcher points at a config file that exists."""
        import glob
        import re

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        scripts = glob.glob(os.path.join(repo, "scripts", "main_table_*", "**", "*.sh"),
                            recursive=True)
        assert len(scripts) == 38, len(scripts)  # 16+16+4+2
        for s in scripts:
            body = open(s).read()
            m = re.search(r"--config (\S+)", body)
            assert m, s
            assert os.path.exists(os.path.join(repo, m.group(1))), (s, m.group(1))


class TestIVideoHook:
    def test_training_video_written(self, tmp_path):
        """The i_video hook renders the spherical path mid-training
        (run_nerf.py:252-283) and writes an mp4 (or npz fallback)."""
        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical
        from scnerf_tpu.train.driver import build_experiment, train_loop

        root = tmp_path / "ds"
        H = W = 16
        for split, n in [("train", 2), ("val", 1), ("test", 1)]:
            os.makedirs(root / split, exist_ok=True)
            frames = []
            for i in range(n):
                pose = np.array(pose_spherical(i * 30.0, -30.0, 4.0))
                img = np.zeros((H, W, 4)); img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}",
                               "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames}))
        flags = {
            "dataset_type": "blender", "datadir": str(root), "N_rand": 16,
            "N_samples": 4, "N_importance": 0, "netdepth": 2, "netwidth": 8,
            "multires": 2, "multires_views": 2, "camera_model": "none",
            "i_video": 4, "i_testset": 100000, "i_img": 100000,
            "expname": "vid", "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        expdir = str(tmp_path / "logs" / "vid")
        os.makedirs(expdir, exist_ok=True)
        exp = build_experiment(cfg, expdir)
        assert exp.render_poses is not None and exp.render_poses.shape[1:] == (4, 4)
        # cap path length for test speed
        exp.render_poses = exp.render_poses[:3]
        train_loop(exp, n_steps=4, eval_hooks=True)
        vids = [f for f in os.listdir(expdir) if f.startswith("video_")]
        assert any("00000004" in v for v in vids), vids


class TestNerfPPDeviceSampling:
    @pytest.mark.slow
    def test_nerfpp_driver_device_sampling(self, tmp_path):
        """run_nerfpp_training with on-device batch sampling (VERDICT item 6:
        device-resident sampling wired for the nerfpp driver)."""
        from tests.test_data import write_png

        rng = np.random.RandomState(3)
        root = tmp_path / "tat"
        H = W = 16
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        for i in range(3):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4); K[0, 0] = K[1, 1] = 14.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1))))
            pose = np.eye(4); pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        flags = {
            "dataset_type": "nerfpp", "datadir": str(root), "N_rand": 32,
            "cascade_samples": "8,8", "cascade_level": 2, "netdepth": 3,
            "netwidth": 32, "max_freq_log2": 4, "max_freq_log2_viewdirs": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "device_sampling": True,
            "i_weights": 1000, "i_print": 2,
            "expname": "ds", "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.nerfpp_driver import build_nerfpp_experiment, run_nerfpp_training

        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        expdir = str(tmp_path / "logs" / "ds")
        os.makedirs(expdir, exist_ok=True)
        state, metrics = run_nerfpp_training(cfg, expdir, n_steps=6)
        assert int(state.step) == 6
        assert np.isfinite(float(metrics["loss"]))


class TestNerfPPHeldOutResolution:
    @pytest.mark.slow
    def test_eval_split_with_different_resolution(self, tmp_path):
        """Held-out NeRF++ eval must render at the SPLIT's resolution, not
        the train split's."""
        import types

        from tests.test_data import write_png

        rng = np.random.RandomState(7)
        root = tmp_path / "tat"
        H = W = 16
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4); K[0, 0] = K[1, 1] = 14.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1))))
            pose = np.eye(4); pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        flags = {
            "dataset_type": "nerfpp", "datadir": str(root), "N_rand": 16,
            "cascade_samples": "4,4", "cascade_level": 2, "netdepth": 2,
            "netwidth": 16, "max_freq_log2": 2, "max_freq_log2_viewdirs": 2,
            "camera_model": "none", "expname": "hr",
            "basedir": str(tmp_path / "logs"),
        }
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.nerfpp_driver import build_nerfpp_experiment, evaluate_nerfpp

        exp = build_nerfpp_experiment(
            experiment_from_flags(flags, warn=lambda *a: None), None)
        He, We = 24, 20  # different eval resolution
        Ke = np.eye(4); Ke[0, 0] = Ke[1, 1] = 18.0
        Ke[0, 2], Ke[1, 2] = We / 2, He / 2
        pose = np.eye(4); pose[:3, 3] = [0.02, 0.0, -0.3]
        eval_data = types.SimpleNamespace(
            poses=np.stack([pose]).astype(np.float32),
            intrinsics=np.stack([Ke]).astype(np.float32),
            images=rng.rand(1, He, We, 3).astype(np.float32),
            H=He, W=We,
        )
        res = evaluate_nerfpp(exp, max_views=1, data=eval_data)
        assert res["split"] == "heldout" and res["n_views"] == 1
        assert np.isfinite(res["psnr"])


class TestPresetFaithfulness:
    """Our published NeRF++ presets must resolve to the SAME experiment
    settings as the reference's config files (hyperparameters verbatim;
    only paths/names may differ)."""

    PAIRS = [
        (f"configs/{fam}/{scene}_ours.txt",
         f"/root/reference/nerfplusplus/configs/{fam}/{scene}_ours.txt")
        for fam in ("fisheyenerf", "fisheyenerf_high")
        for scene in ("chairs", "cube", "flowers", "globe", "heart", "rock")
    ] + [
        (f"configs/tanks_and_temples/{s}_ours.txt",
         f"/root/reference/nerfplusplus/configs/tanks_and_temples/{s}_ours.txt")
        for s in ("tat_intermediate_M60", "tat_intermediate_Playground",
                  "tat_intermediate_Train", "tat_training_Truck")
    ] + [("configs/lf_data/lf_africa.txt",
          "/root/reference/nerfplusplus/configs/lf_data/lf_africa.txt")]

    FIELDS = [
        ("sampling", "N_rand"), ("sampling", "chunk"),
        ("model", "cascade_level"), ("model", "cascade_samples"),
        ("model", "netdepth"), ("model", "netwidth"),
        ("model", "multires"), ("model", "multires_views"),
        ("model", "use_viewdirs"),
        ("camera", "use_camera"), ("camera", "use_distortion"),
        ("camera", "run_fisheye"), ("camera", "multiplicative_noise"),
        ("camera", "add_ie"), ("camera", "add_radial"), ("camera", "add_od"),
        ("camera", "add_prd"),
        ("optim", "N_iters"), ("optim", "lrate"),
        ("optim", "lrate_decay_steps"), ("optim", "lrate_decay_factor"),
        ("dataset", "normalize_factor"),
    ]

    def test_presets_resolve_identically(self):
        n = 0
        for ours_p, ref_p in self.PAIRS:
            if not os.path.exists(ref_p):
                continue
            ours = load_experiment(ours_p, warn=lambda *a: None)
            ref = load_experiment(ref_p, warn=lambda *a: None)
            for section, f in self.FIELDS:
                a = getattr(getattr(ours, section), f)
                b = getattr(getattr(ref, section), f)
                assert a == b, (ours_p, section, f, a, b)
            n += 1
        assert n == 17, n


class TestBatchingWithCamera:
    """The published main-table regime: ``no_batching`` unset (batching ON)
    + camera model (``run_nerf.py:303-305,369-407``) — shuffled global pixel
    indices drawn as per-ray (image, pixel) triples THROUGH the camera."""

    def _build(self, tmp_path, use_batching=True):
        import json as _json

        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import build_experiment

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
                frames.append({"file_path": f"./{split}/r_{i}",
                               "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                _json.dumps({"camera_angle_x": 0.69, "frames": frames}))
        flags = {
            "dataset_type": "blender", "datadir": str(root),
            "N_rand": 64, "N_samples": 8, "N_importance": 8,
            "netdepth": 2, "netwidth": 16, "multires": 4,
            "multires_views": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
            "ray_loss_type": "none",
        }
        if not use_batching:
            flags["no_batching"] = True
        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        return build_experiment(cfg, None)

    def test_pixel_pool_decodes_flat_indices(self):
        from scnerf_tpu.data.batching import PixelPool

        H, W, n_img = 5, 7, 3
        pool = PixelPool(n_img, H, W, seed=1)
        seen = set()
        for _ in range(n_img * H * W // 10):
            img, px, py = pool.next_batch(10)
            assert img.shape == px.shape == py.shape == (10,)
            assert img.max() < n_img and px.max() < W and py.max() < H
            seen.update(
                (int(i), int(x), int(y)) for i, x, y in zip(img, px, py))
        # one epoch covers every (image, pixel) exactly once
        assert len(seen) == n_img * H * W - (n_img * H * W) % 10

    def test_pixel_pool_epoch_reshuffles(self):
        from scnerf_tpu.data.batching import PixelPool

        pool = PixelPool(1, 4, 4, seed=2)
        first = [pool.next_batch(8) for _ in range(2)]
        assert pool.epoch == 0
        pool.next_batch(8)
        assert pool.epoch == 1

    @pytest.mark.slow
    def test_driver_uses_pixel_pool_with_camera_batching(self, tmp_path):
        from scnerf_tpu.train.driver import sample_batch, train_loop

        exp = self._build(tmp_path, use_batching=True)
        assert exp.pixel_pool is not None and exp.ray_pool is None
        batch = sample_batch(exp, 0)
        assert "img_idx" in batch and batch["img_idx"].shape == (64,)
        # per-ray image mixing: a 64-ray draw from 3*256 pixels crosses images
        assert len(np.unique(np.asarray(batch["img_idx"]))) > 1
        state, metrics = train_loop(exp, n_steps=3)
        assert int(state.step) == 3
        assert np.isfinite(float(metrics["loss"]))

    def test_no_batching_keeps_per_image_path(self, tmp_path):
        exp = self._build(tmp_path, use_batching=False)
        assert exp.pixel_pool is None


class TestFisheyeDriver:
    """NeRF++ driver wiring for camera_model=fisheye: Distortion variant
    with k from 18-float intrinsics, tied ray-noise grids, multiplicative
    K noise (reference create_nerf.py:27-34 + camera_model.py:209-312)."""

    def _scene(self, tmp_path):
        from tests.test_data import write_png

        rng = np.random.RandomState(0)
        root = tmp_path / "fe"
        H = W = 16
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 14.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            vals = list(K.reshape(-1)) + [-0.12, 0.04]
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, vals)))
            pose = np.eye(4)
            pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        return str(root)

    @pytest.mark.slow
    def test_fisheye_experiment_builds_distortion_camera(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from scnerf_tpu.train.nerfpp_driver import (
            build_nerfpp_experiment,
            nerfpp_sample_batch,
        )

        cfg = experiment_from_flags({
            "dataset_type": "nerfpp", "datadir": self._scene(tmp_path),
            "N_rand": 32, "cascade_samples": "4,4", "netdepth": 2,
            "netwidth": 16, "max_freq_log2": 2, "max_freq_log2_viewdirs": 2,
            "camera_model": "fisheye", "run_fisheye": True,
            "multiplicative_noise": True,
        }, warn=lambda *a: None)
        exp = build_nerfpp_experiment(cfg)
        cam = exp.state.params["camera"]
        assert cam.config.use_distortion and cam.config.tied_ray_noise
        assert cam.config.multiplicative_noise
        np.testing.assert_allclose(np.asarray(cam.distortion_init),
                                   [-0.12, 0.04], atol=1e-6)
        assert exp.step_prd_fn is None  # run_fisheye disables PRD
        b = nerfpp_sample_batch(exp)
        state, metrics = exp.step_fn(
            exp.state, {k: jnp.asarray(v) for k, v in b.items()},
            jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))


class TestRenderOnlyShim:
    def test_render_only_delegates_to_render_cli(self, monkeypatch, tmp_path):
        """--render_only on the TRAIN entry renders instead of training
        (run_nerf.py:247-283); --render_test selects the test split."""
        import scnerf_tpu.cli.train as train_cli

        calls = []
        import scnerf_tpu.cli.render as render_cli

        monkeypatch.setattr(render_cli, "main",
                            lambda argv: calls.append(argv) or 0)
        cfg_path = tmp_path / "c.txt"
        cfg_path.write_text("datadir = /nonexistent\ndataset_type = llff\n")
        rc = train_cli.main(["--config", str(cfg_path), "--render_only"])
        assert rc == 0 and "path" in calls[0]
        rc = train_cli.main(["--config", str(cfg_path), "--render_only",
                             "--render_test"])
        assert rc == 0 and "test" in calls[1]


class TestNerfPPImgHook:
    @pytest.mark.slow
    def test_i_img_writes_render_panels(self, tmp_path):
        """The i_img hook writes rgb/fg/bg/depth panels
        (ddp_train_nerf.py:580-601 + log_view_to_tb)."""
        from tests.test_data import write_png
        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.nerfpp_driver import run_nerfpp_training

        rng = np.random.RandomState(3)
        root = tmp_path / "tat"
        H = W = 16
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4); K[0, 0] = K[1, 1] = 14.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1))))
            pose = np.eye(4); pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        cfg = experiment_from_flags({
            "dataset_type": "nerfpp", "datadir": str(root), "N_rand": 16,
            "cascade_samples": "4,4", "netdepth": 2, "netwidth": 16,
            "max_freq_log2": 2, "max_freq_log2_viewdirs": 2,
            "i_img": 2, "i_print": 1000, "i_weights": 1000,
            "i_testset": 1000, "expname": "hook",
            "basedir": str(tmp_path / "logs"),
        }, warn=lambda *a: None)
        expdir = str(tmp_path / "logs" / "hook")
        os.makedirs(expdir, exist_ok=True)
        run_nerfpp_training(cfg, expdir, n_steps=3)
        imgs = sorted(os.listdir(os.path.join(expdir, "images")))
        assert any("val_rgb" in f for f in imgs), imgs
        assert any("val_fg_depth" in f for f in imgs), imgs


class TestRenderSplitsFlag:
    def test_render_splits_iterates(self, monkeypatch):
        """--render_splits a,b renders each split in turn
        (ddp_test_nerf's flag)."""
        import scnerf_tpu.cli.render as render_cli

        seen = []
        orig = render_cli.main

        def spy(argv):
            if argv and "--render_splits" not in argv:
                seen.append(argv[argv.index("--split") + 1])
                return 0
            return orig(argv)

        monkeypatch.setattr(render_cli, "main", spy)
        rc = spy(["--config", "x.txt", "--render_splits", "train,validation"])
        assert rc == 0 and seen == ["train", "test"]


class TestHeldOutRenderUsesLearnedCamera:
    def test_c2w_render_goes_through_camera(self, tmp_path):
        """Held-out renders must use the LEARNED K + noise grids with the
        given pose (the reference's camera_idx=None eval path), not the raw
        dataset K."""
        import jax.numpy as jnp

        from scnerf_tpu.train.nerfpp_driver import (
            build_nerfpp_experiment,
            render_nerfpp_image,
        )
        from tests.test_data import write_png

        rng = np.random.RandomState(0)
        root = tmp_path / "d"
        H = W = 12
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(root / "train" / sub, exist_ok=True)
        K = np.eye(4); K[0, 0] = K[1, 1] = 10.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        for i in range(2):
            write_png(root / "train" / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            (root / "train" / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, K.reshape(-1))))
            pose = np.eye(4); pose[:3, 3] = [0.05 * i, 0.0, -0.3]
            (root / "train" / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1))))
        cfg = experiment_from_flags({
            "dataset_type": "nerfpp", "datadir": str(root), "N_rand": 16,
            "cascade_samples": "4,4", "netdepth": 2, "netwidth": 16,
            "max_freq_log2": 2, "max_freq_log2_viewdirs": 2,
            "camera_model": "pinhole_rot_noise_10k_rayo_rayd",
        }, warn=lambda *a: None)
        exp = build_nerfpp_experiment(cfg)
        pose = exp.train_data.poses[1]
        base = render_nerfpp_image(exp, c2w=pose, K=exp.train_data.intrinsics[1],
                                   hw=(H, W))
        # perturb the learned intrinsics; a learned-camera render must move,
        # and must differ from the raw-dataset-K render
        cam = exp.state.params["camera"]
        exp.state = exp.state.replace(params=dict(
            exp.state.params,
            camera=cam.replace(intrinsics_noise=jnp.asarray([3.0, -2.0, 1.0, -1.0])),
        ))
        moved = render_nerfpp_image(exp, c2w=pose, K=exp.train_data.intrinsics[1],
                                    hw=(H, W))
        assert np.abs(moved["rgb"] - base["rgb"]).max() > 1e-4
