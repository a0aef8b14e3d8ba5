"""Renderer and compositing tests (golden values + invariants)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp, query_field
from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
from scnerf_tpu.render.composite import raw2outputs
from scnerf_tpu.render.renderer import RenderConfig, render_chunked, render_rays


class TestEncoding:
    def test_out_dim_and_ordering(self):
        cfg = EncodingConfig(input_dim=3, n_freqs=4)
        x = jnp.array([[0.1, -0.2, 0.3]])
        enc = positional_encoding(x, cfg)
        assert enc.shape == (1, cfg.out_dim) and cfg.out_dim == 3 + 3 * 4 * 2
        np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-7)
        # freq 0 block: sin(x), cos(x)
        np.testing.assert_allclose(enc[0, 3:6], np.sin(x[0]), atol=1e-6)
        np.testing.assert_allclose(enc[0, 6:9], np.cos(x[0]), atol=1e-6)
        # freq 3 (=2^3): last block cos(8x)
        np.testing.assert_allclose(enc[0, -3:], np.cos(8 * x[0]), atol=1e-5)

    def test_nerfpp_4d_input(self):
        cfg = EncodingConfig(input_dim=4, n_freqs=10)
        enc = positional_encoding(jnp.ones((7, 4)), cfg)
        assert enc.shape == (7, 4 + 4 * 10 * 2)


class TestComposite:
    def test_opaque_sample_dominates(self):
        # One huge-sigma sample: its color should win; acc ~ 1.
        raw = jnp.zeros((1, 4, 4))
        raw = raw.at[0, 1, 3].set(1e9)
        raw = raw.at[0, 1, :3].set(jnp.array([5.0, -5.0, 0.0]))  # sigmoid->(1,0,.5)
        z = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        out = raw2outputs(raw, z, rays_d)
        np.testing.assert_allclose(out["rgb"][0], [1.0, 0.0, 0.5], atol=1e-2)
        np.testing.assert_allclose(out["acc"][0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out["depth"][0], 2.0, atol=1e-2)

    @pytest.mark.slow
    def test_empty_space_and_white_bkgd(self):
        raw = jnp.full((2, 8, 4), -100.0)  # relu(sigma)=0 -> transparent
        z = jnp.broadcast_to(jnp.linspace(1, 2, 8), (2, 8))
        rays_d = jnp.ones((2, 3))
        out = raw2outputs(raw, z, rays_d)
        np.testing.assert_allclose(out["acc"], 0.0, atol=1e-6)
        np.testing.assert_allclose(out["rgb"], 0.0, atol=1e-6)
        out_w = raw2outputs(raw, z, rays_d, white_bkgd=True)
        np.testing.assert_allclose(out_w["rgb"], 1.0, atol=1e-6)

    def test_weights_sum_le_one_and_golden_alpha(self):
        key = jax.random.key(0)
        raw = jax.random.normal(key, (16, 32, 4))
        z = jnp.sort(jax.random.uniform(key, (16, 32)) * 4 + 1, axis=-1)
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
        out = raw2outputs(raw, z, rays_d)
        assert float(out["acc"].max()) <= 1.0 + 1e-5
        # Manual first-sample alpha check.
        dist0 = (z[0, 1] - z[0, 0]) * jnp.linalg.norm(rays_d[0])
        alpha0 = 1 - jnp.exp(-jax.nn.relu(raw[0, 0, 3]) * dist0)
        np.testing.assert_allclose(out["weights"][0, 0], alpha0, atol=1e-5)

    def test_ray_d_norm_scales_dists(self):
        raw = jnp.ones((1, 4, 4))
        z = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        out1 = raw2outputs(raw, z, jnp.array([[0.0, 0.0, 1.0]]))
        out2 = raw2outputs(raw, z, jnp.array([[0.0, 0.0, 2.0]]))
        # Larger |d| -> larger dists -> higher first-sample alpha/weight.
        assert float(out2["weights"][0, 0]) > float(out1["weights"][0, 0])
        np.testing.assert_allclose(out1["weights"][0, 0], 1 - np.exp(-1.0), atol=1e-5)
        np.testing.assert_allclose(out2["weights"][0, 0], 1 - np.exp(-2.0), atol=1e-5)


def tiny_setup(use_viewdirs=True, n_importance=8):
    model_cfg = NeRFConfig(depth=3, width=32, skips=(1,), multires=4, multires_views=2,
                           use_viewdirs=use_viewdirs)
    render_cfg = RenderConfig(n_samples=8, n_importance=n_importance, perturb=True, chunk=64)
    key = jax.random.key(0)
    params = {
        "coarse": init_nerf_mlp(key, model_cfg),
        "fine": init_nerf_mlp(jax.random.fold_in(key, 1), model_cfg) if n_importance else None,
    }
    return model_cfg, render_cfg, params


class TestRenderer:
    @pytest.mark.slow
    def test_remat_stash_bf16_close_and_differentiable(self):
        """``remat_stash_bf16`` (the HBM A/B lever) must keep outputs close
        to the f32 stash — the bf16 quantization only touches the sample
        COORDINATES at the checkpoint boundary — and grads finite."""
        model_cfg, render_cfg, params = tiny_setup()
        # remat active: n_samples divisible by chunk, chunk < S
        render_cfg = render_cfg.replace(perturb=False, remat_chunk=4)
        key = jax.random.key(5)
        rays_o = jax.random.normal(key, (16, 3)) * 0.1
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        ref = render_rays(params, model_cfg, render_cfg, rays_o, rays_d, vd,
                          2.0, 6.0, key)
        cfg_b = render_cfg.replace(remat_stash_bf16=True)
        out = render_rays(params, model_cfg, cfg_b, rays_o, rays_d, vd,
                          2.0, 6.0, key)
        np.testing.assert_allclose(np.asarray(out["rgb"]),
                                   np.asarray(ref["rgb"]), atol=0.05)

        def loss(p):
            o = render_rays(p, model_cfg, cfg_b, rays_o, rays_d, vd, 2.0, 6.0, key)
            return jnp.mean(o["rgb"] ** 2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

    @pytest.mark.slow
    def test_shapes_and_finite(self):
        model_cfg, render_cfg, params = tiny_setup()
        key = jax.random.key(2)
        rays_o = jax.random.normal(key, (32, 3))
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (32, 3))
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        out = render_rays(params, model_cfg, render_cfg, rays_o, rays_d, vd, 2.0, 6.0, key)
        for k in ("rgb", "rgb0"):
            assert out[k].shape == (32, 3)
            assert bool(jnp.all(jnp.isfinite(out[k])))
        assert out["z_std"].shape == (32,)

    def test_no_fine_network(self):
        model_cfg, render_cfg, params = tiny_setup(n_importance=0)
        key = jax.random.key(3)
        rays_o = jnp.zeros((16, 3))
        rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        out = render_rays(params, model_cfg, render_cfg, rays_o, rays_d, rays_d, 1.0, 5.0, key)
        assert "rgb0" not in out and out["rgb"].shape == (16, 3)

    @pytest.mark.slow
    def test_chunked_matches_direct_when_det(self):
        model_cfg, render_cfg, params = tiny_setup()
        render_cfg = render_cfg.replace(perturb=False, chunk=40)  # non-divisor chunk
        key = jax.random.key(4)
        rays_o = jax.random.normal(key, (100, 3)) * 0.1
        rays_d = jax.random.normal(jax.random.fold_in(key, 9), (100, 3))
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        direct = render_rays(params, model_cfg, render_cfg, rays_o, rays_d, vd, 2.0, 6.0, key)
        chunked = render_chunked(params, model_cfg, render_cfg, rays_o, rays_d, vd, 2.0, 6.0, key)
        np.testing.assert_allclose(chunked["rgb"], direct["rgb"], atol=5e-5)
        np.testing.assert_allclose(chunked["acc"], direct["acc"], atol=5e-5)

    @pytest.mark.slow
    def test_gradients_flow_to_mlp(self):
        model_cfg, render_cfg, params = tiny_setup()
        key = jax.random.key(5)
        rays_o = jnp.zeros((8, 3))
        rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))

        def loss(params):
            out = render_rays(params, model_cfg, render_cfg, rays_o, rays_d, rays_d, 1.0, 4.0, key)
            return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["rgb0"] ** 2)

        g = jax.grad(loss)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g)))
        assert float(gnorm) > 0
