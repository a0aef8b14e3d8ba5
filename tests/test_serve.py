"""Serving module: AOT service, jax.export artifacts, compile cache.

The reference has no serving path to cite; these tests pin OUR deployment
contract instead: the served outputs are bit-identical to the eval render
path (``render_chunked`` with eval-mode config, the thing the metrics run
on), artifacts round-trip through ``jax.export`` bytes, and the
data-parallel service matches single-device.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
from scnerf_tpu.fields.nerfpp import NerfPPConfig, init_nerfpp_net
from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig, render_rays_nerfpp
from scnerf_tpu.render.renderer import RenderConfig, render_rays
from scnerf_tpu.serve import (
    RenderService,
    enable_compilation_cache,
    export_serving_fn,
    load_serving_fn,
    make_nerf_serve_fn,
    make_nerfpp_serve_fn,
    nerf_serve_specs,
    nerfpp_serve_specs,
)

MODEL_CFG = NeRFConfig(depth=3, width=32, skips=(1,), multires=4, multires_views=2)
RENDER_CFG = RenderConfig(n_samples=8, n_importance=8, remat_chunk=0, near=0.5, far=2.0)


def _nerf_setup(key=0):
    k = jax.random.key(key)
    params = {
        "coarse": init_nerf_mlp(k, MODEL_CFG),
        "fine": init_nerf_mlp(jax.random.fold_in(k, 1), MODEL_CFG),
    }
    return params


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = np.full((n,), 0.5, np.float32)
    far = np.full((n,), 2.0, np.float32)
    return rays_o, rays_d, near, far


class TestNerfServeFn:
    @pytest.mark.slow
    def test_matches_eval_render_path(self):
        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG)
        rays_o, rays_d, near, far = _rays(16)
        got = fn(rays_o, rays_d, near, far)

        eval_cfg = RENDER_CFG.eval_mode()
        viewdirs = rays_d / (np.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-10)
        want = render_rays(
            params, MODEL_CFG, eval_cfg, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(viewdirs), near, far, jax.random.key(0),
        )
        np.testing.assert_allclose(got["rgb"], np.minimum(np.asarray(want["rgb"]), 1.0),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6, atol=1e-6)
        assert set(got) == {"rgb", "depth", "acc", "disp"}

    def test_deterministic(self):
        params = _nerf_setup()
        fn = jax.jit(make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG))
        rays = _rays(8)
        a, b = fn(*rays), fn(*rays)
        np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))

    @pytest.mark.slow
    def test_ndc_variant_runs(self):
        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG,
                                ndc=(24, 32, 30.0, 30.0))
        rays_o, rays_d, near, far = _rays(8)
        rays_d = np.abs(rays_d) * np.array([1, 1, -1], np.float32)  # forward-facing
        out = fn(rays_o, rays_d, near, far)
        assert np.isfinite(np.asarray(out["rgb"])).all()


class TestRenderService:
    @pytest.mark.slow
    def test_pads_and_matches_direct(self):
        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG)
        svc = RenderService(fn, nerf_serve_specs(8))
        rays = _rays(19)  # not a multiple of 8 → pad + 3 slices
        got = svc(*rays)
        want = fn(*(jnp.asarray(x) for x in rays))
        assert got["rgb"].shape == (19, 3)
        # batch-8 AOT executable vs eager 19-ray trace: XLA fuses each
        # differently, so agreement is to f32-reassociation tolerance
        np.testing.assert_allclose(got["rgb"], want["rgb"], rtol=5e-4, atol=5e-5)

    def test_data_parallel_matches_single(self):
        from jax.sharding import Mesh

        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG)
        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("dp",))
        svc_dp = RenderService(fn, nerf_serve_specs(8), mesh=mesh)
        svc_1 = RenderService(fn, nerf_serve_specs(8))
        rays = _rays(13)
        a, b = svc_dp(*rays), svc_1(*rays)
        np.testing.assert_allclose(a["rgb"], b["rgb"], rtol=1e-5, atol=1e-6)

    def test_mesh_divisibility_guard(self):
        from jax.sharding import Mesh

        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG)
        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        with pytest.raises(ValueError, match="divisible"):
            RenderService(fn, nerf_serve_specs(6), mesh=mesh)


class TestExportArtifact:
    def test_roundtrip_bytes_and_file(self, tmp_path):
        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG, outputs=("rgb",))
        specs = nerf_serve_specs(8)
        path = str(tmp_path / "nerf_serve.jaxexport")
        data = export_serving_fn(fn, specs, path=path)
        assert os.path.getsize(path) == len(data) > 0

        loaded = load_serving_fn(path)
        rays = _rays(8)
        got = loaded(*(jnp.asarray(x) for x in rays))
        want = fn(*(jnp.asarray(x) for x in rays))
        np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(want["rgb"]),
                                   rtol=1e-6, atol=1e-6)
        # introspection survives the round trip
        assert loaded.exported.in_avals[0].shape == (8, 3)

    @pytest.mark.slow
    def test_loaded_artifact_feeds_service(self, tmp_path):
        """The deserialized artifact is itself jittable → servable."""
        params = _nerf_setup()
        fn = make_nerf_serve_fn(params, MODEL_CFG, RENDER_CFG, outputs=("rgb",))
        data = export_serving_fn(fn, nerf_serve_specs(8))
        loaded = load_serving_fn(data)
        svc = RenderService(loaded, nerf_serve_specs(8))
        rays = _rays(10)
        got = svc(*rays)
        want = fn(*(jnp.asarray(x) for x in rays))
        # artifact-compiled vs eager-trace tolerance (see above)
        np.testing.assert_allclose(got["rgb"], want["rgb"], rtol=5e-4, atol=5e-5)


class TestNerfPPServe:
    CFG = NerfPPConfig(depth=2, width=16, skips=(1,), max_freq_log2=3,
                       max_freq_log2_viewdirs=2)
    RCFG = NerfPPRenderConfig(cascade_samples=(6, 6), remat_chunk=0)

    def _setup(self):
        k = jax.random.key(7)
        return [init_nerfpp_net(jax.random.fold_in(k, m), self.CFG) for m in range(2)]

    def _rays(self, n):
        rng = np.random.default_rng(3)
        ray_o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
        ray_d = rng.normal(size=(n, 3)).astype(np.float32)
        ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
        return ray_o, ray_d, np.full((n,), 1e-4, np.float32)

    @pytest.mark.slow
    def test_matches_eval_path_and_exports(self, tmp_path):
        level_params = self._setup()
        fn = make_nerfpp_serve_fn(level_params, self.CFG, self.RCFG)
        ray_o, ray_d, md = self._rays(8)
        got = fn(ray_o, ray_d, md)

        outs = render_rays_nerfpp(
            level_params, self.CFG, self.RCFG.replace(perturb=False),
            jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(md),
            jax.random.key(0),
        )
        np.testing.assert_allclose(got["rgb"], outs[-1]["rgb"], rtol=1e-6, atol=1e-6)
        assert set(got) == {"rgb", "fg_depth", "bg_lambda"}

        data = export_serving_fn(fn, nerfpp_serve_specs(8))
        loaded = load_serving_fn(data)
        got2 = loaded(jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(md))
        np.testing.assert_allclose(np.asarray(got2["rgb"]), got["rgb"],
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.slow
    def test_service(self):
        level_params = self._setup()
        fn = make_nerfpp_serve_fn(level_params, self.CFG, self.RCFG)
        svc = RenderService(fn, nerfpp_serve_specs(8))
        ray_o, ray_d, md = self._rays(11)
        got = svc(ray_o, ray_d, md)
        want = fn(*(jnp.asarray(x) for x in (ray_o, ray_d, md)))
        np.testing.assert_allclose(got["rgb"], want["rgb"], rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestExportCli:
    def test_blender_train_then_export(self, tmp_path):
        """Checkpoint -> artifact -> load -> call, via the CLI (NeRF path)."""
        import json

        from scnerf_tpu.data.blender import pose_spherical
        from tests.test_data import write_png

        root = tmp_path / "ds"
        H = W = 16
        for split, n in [("train", 3), ("val", 1), ("test", 1)]:
            os.makedirs(root / split, exist_ok=True)
            frames = []
            for i in range(n):
                pose = np.array(pose_spherical(i * 40.0, -30.0, 4.0))
                img = np.zeros((H, W, 4))
                img[4:12, 4:12, :3] = [1, 0.4, 0.2]
                img[..., 3] = 1
                write_png(root / split / f"r_{i}.png", img)
                frames.append({"file_path": f"./{split}/r_{i}",
                               "transform_matrix": pose.tolist()})
            (root / f"transforms_{split}.json").write_text(
                json.dumps({"camera_angle_x": 0.69, "frames": frames}))
        cfgfile = tmp_path / "cfg.txt"
        cfgfile.write_text(f"""
        dataset_type = blender
        datadir = {root}
        white_bkgd = True
        N_rand = 32
        N_samples = 8
        N_importance = 8
        netdepth = 3
        netwidth = 32
        multires = 4
        multires_views = 2
        no_batching = True
        i_weights = 2
        i_print = 1
        expname = expcli
        basedir = {tmp_path / "logs"}
        """)
        from scnerf_tpu.cli.export import main as export_main
        from scnerf_tpu.cli.train import main as train_main

        assert train_main(["--config", str(cfgfile), "--steps", "2"]) == 0
        out = str(tmp_path / "serve.jaxexport")
        assert export_main(["--config", str(cfgfile), "--out", out,
                            "--batch", "64"]) == 0
        meta = json.loads((tmp_path / "serve.jaxexport.json").read_text())
        assert meta["pipeline"] == "nerf" and meta["batch"] == 64
        assert meta["step"] == 2

        loaded = load_serving_fn(out)
        svc = RenderService(loaded, nerf_serve_specs(64))
        rays = _rays(70)
        got = svc(*rays)
        assert got["rgb"].shape == (70, 3)
        assert np.isfinite(got["rgb"]).all()


class TestCompilationCache:
    def test_enable(self, tmp_path):
        d = enable_compilation_cache(str(tmp_path / "xla_cache"))
        assert os.path.isdir(d)
        # a compile should not error with the cache active (content-writing
        # is backend-dependent; the contract here is "safe to enable")
        jax.jit(lambda x: x * 2 + 1).lower(jnp.ones((4,))).compile()
