"""Checkpoint-conversion parity: build the REFERENCE torch modules, convert
their weights, and compare full forward passes against ours."""
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_reference_parity import _load_ref_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_helpers():
    return _load_ref_module("NeRF/run_nerf_helpers.py", "ref_run_nerf_helpers")


@pytest.fixture(scope="module")
def ref_nerfpp_net():
    return _load_ref_module("nerfplusplus/nerf_network.py", "ref_nerf_network")


class TestNerfMlpConversion:
    def test_forward_parity(self, ref_helpers):
        import jax.numpy as jnp

        from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
        from scnerf_tpu.fields.nerf import NeRFConfig, nerf_mlp_apply
        from scnerf_tpu.tools.convert import torch_nerf_to_params

        torch.manual_seed(0)
        input_ch, input_ch_views = 63, 27
        ref = ref_helpers.NeRF(
            D=8, W=256, input_ch=input_ch, input_ch_views=input_ch_views,
            use_viewdirs=True,
        )
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_nerf_to_params(sd)

        cfg = NeRFConfig()  # multires 10/4 -> 63/27 channels
        rng = np.random.RandomState(0)
        pts = rng.randn(128, 3).astype(np.float32) * 0.5
        vd = rng.randn(128, 3).astype(np.float32)
        vd /= np.linalg.norm(vd, axis=-1, keepdims=True)

        pe = positional_encoding(jnp.asarray(pts), EncodingConfig(3, 10))
        ve = positional_encoding(jnp.asarray(vd), EncodingConfig(3, 4))
        got = np.asarray(nerf_mlp_apply(params, cfg, pe, ve))

        with torch.no_grad():
            x = torch.cat(
                [torch.from_numpy(np.asarray(pe)), torch.from_numpy(np.asarray(ve))],
                dim=-1,
            )
            want = ref(x).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_no_viewdirs_variant(self, ref_helpers):
        import jax.numpy as jnp

        from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
        from scnerf_tpu.fields.nerf import NeRFConfig, nerf_mlp_apply
        from scnerf_tpu.tools.convert import torch_nerf_to_params

        torch.manual_seed(1)
        ref = ref_helpers.NeRF(D=8, W=256, input_ch=63, output_ch=4, use_viewdirs=False)
        params = torch_nerf_to_params(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        )
        cfg = NeRFConfig(use_viewdirs=False)
        rng = np.random.RandomState(1)
        pts = rng.randn(64, 3).astype(np.float32)
        pe = positional_encoding(jnp.asarray(pts), EncodingConfig(3, 10))
        got = np.asarray(nerf_mlp_apply(params, cfg, pe, None))
        with torch.no_grad():
            # The reference forward always splits off input_ch_views (=3)
            # trailing channels even when unused — pad with zeros.
            x = torch.cat(
                [torch.from_numpy(np.asarray(pe)), torch.zeros(pe.shape[0], 3)], dim=-1
            )
            want = ref(x).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestMlpNetConversion:
    def test_forward_parity(self, ref_nerfpp_net):
        import jax.numpy as jnp

        from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
        from scnerf_tpu.fields.nerfpp import NerfPPConfig, mlpnet_apply
        from scnerf_tpu.tools.convert import torch_mlpnet_to_params

        torch.manual_seed(2)
        cfg = NerfPPConfig()  # max_freq 10/4
        in_ch = cfg.pos_encoding(3).out_dim
        view_ch = cfg.view_encoding.out_dim
        ref = ref_nerfpp_net.MLPNet(
            D=8, W=256, input_ch=in_ch, input_ch_viewdirs=view_ch, use_viewdirs=True
        )
        params = torch_mlpnet_to_params(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        )
        rng = np.random.RandomState(2)
        pts = rng.randn(64, 3).astype(np.float32) * 0.4
        vd = rng.randn(64, 3).astype(np.float32)
        vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
        pe = positional_encoding(jnp.asarray(pts), cfg.pos_encoding(3))
        ve = positional_encoding(jnp.asarray(vd), cfg.view_encoding)
        rgb, sigma = mlpnet_apply(params, cfg, pe, ve)
        with torch.no_grad():
            out = ref(torch.cat(
                [torch.from_numpy(np.asarray(pe)), torch.from_numpy(np.asarray(ve))],
                dim=-1,
            ))
        np.testing.assert_allclose(np.asarray(rgb), out["rgb"].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(sigma), out["sigma"].numpy(), atol=2e-5)


class TestCameraConversion:
    def test_field_mapping(self):
        from scnerf_tpu.tools.convert import torch_camera_to_fields

        rng = np.random.RandomState(3)
        sd = {
            "intrinsics_initial": rng.rand(4).astype(np.float32),
            "extrinsics_initial": rng.rand(5, 9).astype(np.float32),
            "intrinsics_noise": rng.rand(4).astype(np.float32),
            "extrinsics_noise": rng.rand(5, 9).astype(np.float32),
            "ray_o_noise": rng.rand(7, 9, 3).astype(np.float32),
            "ray_d_noise": rng.rand(7, 9, 3).astype(np.float32),
        }
        fields = torch_camera_to_fields(sd)
        np.testing.assert_array_equal(np.asarray(fields["intrinsics_init"]), sd["intrinsics_initial"])
        np.testing.assert_array_equal(np.asarray(fields["ray_o_grid"]), sd["ray_o_noise"])
        assert "distortion_init" not in fields


class TestReferenceCheckpointLoading:
    def test_load_reference_tar_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        import jax

        from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
        from scnerf_tpu.tools.convert import (
            load_reference_checkpoint,
            params_to_torch_nerf,
        )

        cfg = NeRFConfig(depth=3, width=16, skips=(1,), multires=2, multires_views=2)
        p = {"coarse": init_nerf_mlp(jax.random.key(0), cfg),
             "fine": init_nerf_mlp(jax.random.key(1), cfg)}
        tar = str(tmp_path / "200000.tar")
        torch.save({
            "global_step": 200000,
            "network_fn_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                      for k, v in params_to_torch_nerf(p["coarse"]).items()},
            "network_fine_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                        for k, v in params_to_torch_nerf(p["fine"]).items()},
            "optimizer_state_dict": {"state": {}},
        }, tar)
        out = load_reference_checkpoint(tar, depth=3)
        assert out["step"] == 200000 and out["camera_fields"] is None
        for a, b in zip(jax.tree.leaves(p["coarse"]), jax.tree.leaves(out["coarse"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_driver_warm_starts_from_reference_tar(self, tmp_path):
        """The main_table_2 regime: --ft_path pointing at a reference .tar
        warm-starts our driver (weights converted, step restored)."""
        torch = pytest.importorskip("torch")
        import jax
        import json as _json
        import os as _os

        from tests.test_data import write_png
        from scnerf_tpu.data.blender import pose_spherical
        from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
        from scnerf_tpu.tools.convert import params_to_torch_nerf

        root = tmp_path / "ds"
        H = W = 16
        for split, n in [("train", 2), ("val", 1), ("test", 1)]:
            _os.makedirs(root / split, exist_ok=True)
            frames = []
            for i in range(n):
                pose = np.array(pose_spherical(i * 30.0, -30.0, 4.0))
                img = np.zeros((H, W, 4)); img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}",
                               "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                _json.dumps({"camera_angle_x": 0.69, "frames": frames}))

        mcfg = NeRFConfig(depth=2, width=16, skips=(1,), multires=2, multires_views=2)
        marker = {"coarse": init_nerf_mlp(jax.random.key(9), mcfg),
                  "fine": init_nerf_mlp(jax.random.key(10), mcfg)}
        tar = str(tmp_path / "ref_ckpt.tar")
        torch.save({
            "global_step": 1234,
            "network_fn_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                      for k, v in params_to_torch_nerf(marker["coarse"]).items()},
            "network_fine_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                        for k, v in params_to_torch_nerf(marker["fine"]).items()},
            "optimizer_state_dict": {"state": {}},
        }, tar)

        from scnerf_tpu.core.config import experiment_from_flags
        from scnerf_tpu.train.driver import build_experiment

        flags = {"dataset_type": "blender", "datadir": str(root), "N_rand": 16,
                 "N_samples": 4, "N_importance": 4, "netdepth": 2, "netwidth": 16,
                 "multires": 2, "multires_views": 2, "camera_model": "none",
                 "ft_path": tar, "expname": "warm", "basedir": str(tmp_path / "logs")}
        cfg = experiment_from_flags(flags, warn=lambda *a: None)
        # NeRFConfig skips default (4,) but depth 2 -> driver builds skips
        # from its own config; weights shapes must line up with depth 2.
        exp = build_experiment(cfg, None)
        assert int(exp.state.step) == 1234
        got = exp.state.params["coarse"]
        for a, b in zip(jax.tree.leaves(marker["coarse"]), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTiedCameraCheckpointConversion:
    def test_distortion_ckpt_maps_shared_buffer_once(self):
        """A reference Distortion-camera state dict stores the SAME tensor
        as both ray_o_noise and ray_d_noise (aliased storage). Converting
        must not double it: tied cameras read leaf sums, so the shared
        value lands in ray_o_grid with ray_d_grid zeroed."""
        from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera, pixels_to_rays
        from scnerf_tpu.tools.convert import torch_camera_to_fields

        rng = np.random.RandomState(0)
        s = rng.randn(4, 6, 3).astype(np.float32)
        H, W = 40, 60
        sd = {
            "intrinsics_initial": np.array([50.0, 55.0, 30.0, 20.0], np.float32),
            "extrinsics_initial": rng.randn(2, 9).astype(np.float32),
            "distortion_initial": np.array([-0.1, 0.02], np.float32),
            "intrinsics_noise": rng.randn(4).astype(np.float32) * 1e-3,
            "extrinsics_noise": rng.randn(2, 9).astype(np.float32) * 1e-3,
            "distortion_noise": rng.randn(2).astype(np.float32) * 1e-3,
            "ray_o_noise": s,
            "ray_d_noise": s.copy(),  # aliased in torch -> equal when saved
        }
        fields = torch_camera_to_fields(sd)
        np.testing.assert_array_equal(np.asarray(fields["ray_o_grid"]), s)
        np.testing.assert_array_equal(np.asarray(fields["ray_d_grid"]), 0.0)

        cfg = CameraConfig(H=H, W=W, grid_size=10, convention=OPENCV,
                           pixel_offset=0.5, use_distortion=True,
                           tied_ray_noise=True)
        K = np.array([[50.0, 0, 30, 0], [0, 55.0, 20, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.stack([np.eye(4)] * 2)
        E[:, 2, 3] = -0.5
        cam = init_camera(K, E, cfg).replace(**fields)
        # effective noise must equal the torch shared value s, not 2s:
        # compare against an untied camera holding s in both grids (whose
        # paths each read their own grid = s).
        cam_ref = init_camera(K, E, cfg.replace(tied_ray_noise=False)).replace(
            **dict(fields, ray_o_grid=jnp.asarray(s), ray_d_grid=jnp.asarray(s)))
        px = jnp.asarray([3.0, 25.0, 50.0])
        py = jnp.asarray([2.0, 15.0, 33.0])
        ro_t, rd_t = pixels_to_rays(cam, px, py, image_idx=0)
        ro_r, rd_r = pixels_to_rays(cam_ref, px, py, image_idx=0)
        np.testing.assert_allclose(np.asarray(ro_t), np.asarray(ro_r), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rd_t), np.asarray(rd_r), rtol=1e-6)

    def test_untied_ckpt_keeps_both_grids(self):
        from scnerf_tpu.tools.convert import torch_camera_to_fields

        rng = np.random.RandomState(1)
        a, b = rng.randn(2, 4, 6, 3).astype(np.float32)
        sd = {"ray_o_noise": a, "ray_d_noise": b}  # no distortion keys
        fields = torch_camera_to_fields(sd)
        np.testing.assert_array_equal(np.asarray(fields["ray_o_grid"]), a)
        np.testing.assert_array_equal(np.asarray(fields["ray_d_grid"]), b)

    def test_tied_camera_exports_shared_sum(self):
        """fields->torch roundtrip for tied cameras: both ray entries get
        the leaf SUM (the effective shared value)."""
        from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera
        from scnerf_tpu.tools.convert import (
            camera_fields_to_torch,
            torch_camera_to_fields,
        )

        rng = np.random.RandomState(2)
        cfg = CameraConfig(H=40, W=60, grid_size=10, convention=OPENCV,
                           pixel_offset=0.5, use_distortion=True,
                           tied_ray_noise=True)
        K = np.array([[50.0, 0, 30, 0], [0, 55.0, 20, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.stack([np.eye(4)] * 2)
        E[:, 2, 3] = -0.5
        a = rng.randn(4, 6, 3).astype(np.float32)
        b = rng.randn(4, 6, 3).astype(np.float32)
        cam = init_camera(K, E, cfg, k=np.array([-0.1, 0.02])).replace(
            ray_o_grid=jnp.asarray(a), ray_d_grid=jnp.asarray(b))
        sd = camera_fields_to_torch(cam)
        np.testing.assert_allclose(sd["ray_o_noise"], a + b, rtol=1e-6)
        np.testing.assert_allclose(sd["ray_d_noise"], a + b, rtol=1e-6)
        # and converting back yields the same effective value once
        back = torch_camera_to_fields(sd)
        np.testing.assert_allclose(
            np.asarray(back["ray_o_grid"]) + np.asarray(back["ray_d_grid"]),
            a + b, rtol=1e-6)
