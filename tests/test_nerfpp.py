"""NeRF++ pipeline tests: inverted-sphere geometry, fg/bg compositing,
cascade training, auto-exposure."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera
from scnerf_tpu.fields.nerfpp import (
    NerfPPConfig,
    autoexpo_params,
    init_nerfpp_net,
    nerfpp_forward,
)
from scnerf_tpu.geometry.sphere import depth2pts_outside, intersect_sphere
from scnerf_tpu.render.nerfpp_renderer import (
    NerfPPRenderConfig,
    render_chunked_nerfpp,
    render_rays_nerfpp,
)
from scnerf_tpu.train.curriculum import Curriculum
from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
from scnerf_tpu.train.optim import make_optimizer
from scnerf_tpu.train.step import create_train_state

CFG = NerfPPConfig(depth=3, width=32, skips=(1,), max_freq_log2=4, max_freq_log2_viewdirs=2)
RCFG = NerfPPRenderConfig(cascade_samples=(8, 8), perturb=True, chunk=32)


class TestSphereGeometry:
    def test_intersect_sphere_axis_ray(self):
        # Camera at origin looking +z: exits at z=1.
        d = intersect_sphere(jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 0, 1]]))
        np.testing.assert_allclose(d[0], 1.0, atol=1e-6)
        # Offset camera: chord length.
        d = intersect_sphere(jnp.array([[0.5, 0, 0]]), jnp.array([[0.0, 0, 1]]))
        np.testing.assert_allclose(d[0], np.sqrt(1 - 0.25), atol=1e-6)

    def test_depth2pts_outside_unit_norm_and_inverse_depth(self):
        o = jnp.array([[0.1, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        depth = jnp.array([[0.5, 0.25]])
        pts, real = depth2pts_outside(
            jnp.broadcast_to(o[:, None], (1, 2, 3)),
            jnp.broadcast_to(d[:, None], (1, 2, 3)),
            depth,
        )
        np.testing.assert_allclose(
            jnp.linalg.norm(pts[..., :3], axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(pts[..., 3], depth, atol=1e-6)
        # Smaller inverse depth -> farther real point.
        assert float(real[0, 1]) > float(real[0, 0]) > 1.0


def rand_rays(key, n=16):
    o = jax.random.normal(key, (n, 3)) * 0.2  # inside unit sphere
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return o, d


class TestNerfPPForward:
    @pytest.mark.slow
    def test_composite_shapes_and_ranges(self):
        key = jax.random.key(0)
        params = init_nerfpp_net(key, CFG)
        o, d = rand_rays(jax.random.fold_in(key, 2))
        far = intersect_sphere(o, d)
        fg_z = jnp.linspace(1e-4, 1.0, 8)[None] * far[:, None]
        bg_z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (16, 8))
        out = nerfpp_forward(params, CFG, o, d, far, fg_z, bg_z)
        assert out["rgb"].shape == (16, 3)
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))
        assert float(out["bg_lambda"].min()) >= 0.0
        assert float(out["bg_lambda"].max()) <= 1.0 + 1e-5
        # fg + bg weights can't over-accumulate.
        assert float((out["fg_weights"].sum(-1) + out["bg_weights"].sum(-1) * out["bg_lambda"]).max()) <= 1.0 + 1e-3

    def test_opaque_fg_blocks_bg(self):
        key = jax.random.key(1)
        params = init_nerfpp_net(key, CFG)
        # Crank fg sigma bias enormous -> bg_lambda ~ 0.
        params["fg"]["sigma"]["b"] = params["fg"]["sigma"]["b"] + 1e6
        o, d = rand_rays(jax.random.fold_in(key, 3))
        far = intersect_sphere(o, d)
        fg_z = jnp.linspace(1e-4, 1.0, 8)[None] * far[:, None]
        bg_z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (16, 8))
        out = nerfpp_forward(params, CFG, o, d, far, fg_z, bg_z)
        np.testing.assert_allclose(out["bg_lambda"], 0.0, atol=1e-5)
        np.testing.assert_allclose(out["bg_rgb"], 0.0, atol=1e-5)


class TestCascade:
    @pytest.mark.slow
    def test_levels_and_sample_growth(self):
        key = jax.random.key(2)
        params = [init_nerfpp_net(jax.random.fold_in(key, m), CFG) for m in range(2)]
        o, d = rand_rays(jax.random.fold_in(key, 9))
        outs = render_rays_nerfpp(params, CFG, RCFG, o, d, jnp.full((16,), 1e-4), key)
        assert len(outs) == 2
        assert outs[0]["fg_weights"].shape == (16, 8)
        assert outs[1]["fg_weights"].shape == (16, 16)  # 8 old + 8 resampled

    @pytest.mark.slow
    def test_chunked_matches_direct_det(self):
        key = jax.random.key(3)
        rcfg = RCFG.replace(perturb=False, chunk=12)
        params = [init_nerfpp_net(jax.random.fold_in(key, m), CFG) for m in range(2)]
        o, d = rand_rays(jax.random.fold_in(key, 4), n=30)
        md = jnp.full((30,), 1e-4)
        direct = render_rays_nerfpp(params, CFG, rcfg, o, d, md, key)[-1]
        chunked = render_chunked_nerfpp(params, CFG, rcfg, o, d, md, key)
        np.testing.assert_allclose(chunked["rgb"], direct["rgb"], atol=5e-5)


class TestNerfPPTraining:
    def build(self, autoexpo=False):
        cfg = CameraConfig(H=16, W=16, grid_size=4, convention=OPENCV, pixel_offset=0.5)
        K = np.array([[12.0, 0, 8, 0], [0, 12.0, 8, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
        E[:, :3, 3] = [[0.0, 0, -0.3], [0.05, 0, -0.3]]
        cam = init_camera(K, E, cfg)
        key = jax.random.key(5)
        params = {
            "levels": [
                init_nerfpp_net(jax.random.fold_in(key, m), CFG, n_images=2, autoexpo=autoexpo)
                for m in range(2)
            ],
            "camera": cam,
        }
        tcfg = NerfPPTrainConfig(lr_init=5e-3, autoexpo=autoexpo)
        tx = make_optimizer(tcfg.lr_init, 1e6, params_example=params)
        state = create_train_state(params, tx)
        step = make_nerfpp_train_step(CFG, RCFG, tcfg, Curriculum(), tx, donate=False)
        n = 64
        rng = np.random.RandomState(0)
        batch = {
            "px": jnp.asarray(rng.randint(0, 16, n).astype(np.float32)),
            "py": jnp.asarray(rng.randint(0, 16, n).astype(np.float32)),
            "img_idx": jnp.asarray(0),
            "target": jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.2 + 0.4),
            "min_depth": jnp.full((n,), 1e-4),
        }
        return state, step, batch

    @pytest.mark.slow
    def test_loss_decreases(self):
        state, step, batch = self.build()
        key = jax.random.key(6)
        losses = []
        for i in range(20):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_autoexpo_params_update(self):
        state, step, batch = self.build(autoexpo=True)
        ae0 = np.array(state.params["levels"][0]["autoexpo"])
        key = jax.random.key(7)
        for i in range(3):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        ae1 = np.array(state.params["levels"][0]["autoexpo"])
        assert np.abs(ae1 - ae0).sum() > 0
        s, sh = autoexpo_params(state.params["levels"][0], 0)
        assert float(s) >= 0.5  # scale = |raw| + 0.5


class TestFusedFgBg:
    """NerfPPConfig(fuse_fgbg=True) — one batched remat scan for both nets —
    must reproduce the sequential path exactly (up to f32 reassociation:
    the fg net runs with zero rows scattered into the 4-D encoding layout,
    fields/nerfpp.py:stack_fgbg_params)."""

    def _inputs(self, n=8, s=8):
        rng = np.random.RandomState(1)
        ray_o = jnp.asarray(rng.randn(n, 3) * 0.1)
        ray_d = jnp.asarray(rng.randn(n, 3))
        fg_z_max = jnp.asarray(1.0 + rng.rand(n))
        fg_z = jnp.sort(jnp.asarray(rng.rand(n, s)), axis=-1) * 0.9 + 0.05
        bg_z = jnp.sort(jnp.asarray(rng.rand(n, s)), axis=-1)
        return ray_o, ray_d, fg_z_max, fg_z, bg_z

    @pytest.mark.slow
    def test_forward_and_grads_match_sequential(self):
        params = init_nerfpp_net(jax.random.key(0), CFG, n_images=2)
        cfg_fused = CFG.replace(fuse_fgbg=True)
        ray_o, ray_d, fg_z_max, fg_z, bg_z = self._inputs()

        def loss(p, cfg, chunk):
            out = nerfpp_forward(p, cfg, ray_o, ray_d, fg_z_max, fg_z, bg_z,
                                 remat_chunk=chunk)
            return sum(jnp.sum(v) for v in out.values()), out

        for chunk in (0, 4):
            (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(
                params, CFG, chunk)
            (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(
                params, cfg_fused, chunk)
            for k in o0:
                np.testing.assert_allclose(o0[k], o1[k], rtol=2e-5, atol=2e-6)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    a, b, rtol=5e-4, atol=1e-6), g0, g1)

    @pytest.mark.slow
    def test_fused_train_step_runs(self):
        cfg_fused = CFG.replace(fuse_fgbg=True)
        rcfg = RCFG.replace(remat_chunk=4)
        key = jax.random.key(3)
        H = W = 16
        K = np.array([[12.0, 0, 8, 0], [0, 12.0, 8, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.tile(np.eye(4), (2, 1, 1))
        E[:, 2, 3] = 0.1
        cam = init_camera(K, E, CameraConfig(H=H, W=W, convention=OPENCV,
                                             pixel_offset=0.5))
        params = {
            "levels": [init_nerfpp_net(jax.random.fold_in(key, m), cfg_fused,
                                       n_images=2) for m in range(2)],
            "camera": cam,
        }
        tx = make_optimizer(5e-4, 750e3, params_example=params)
        state = create_train_state(params, tx)
        step = make_nerfpp_train_step(cfg_fused, rcfg, NerfPPTrainConfig(),
                                      Curriculum(), tx)
        rng = np.random.RandomState(0)
        batch = {
            "px": jnp.asarray(rng.randint(0, W, 16).astype(np.float32)),
            "py": jnp.asarray(rng.randint(0, H, 16).astype(np.float32)),
            "img_idx": jnp.asarray(0),
            "target": jnp.asarray(rng.rand(16, 3).astype(np.float32)),
            "min_depth": jnp.full((16,), 1e-4),
        }
        state, metrics = step(state, batch, key)
        assert np.isfinite(float(metrics["loss"]))
