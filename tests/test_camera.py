"""Camera model + ray generation tests.

Golden values are computed analytically (not from torch); the F.interpolate
parity test uses a numpy reimplementation of align_corners=False bilinear
upsampling as the oracle.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera import (
    OPENCV,
    OPENGL,
    Camera,
    CameraConfig,
    apply_radial_distortion,
    get_distortion,
    get_extrinsic,
    get_extrinsics,
    get_intrinsic,
    init_camera,
    pixels_to_rays,
    rays_full_image,
    rays_no_camera,
    sample_noise_grid,
)
from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44


def make_camera(convention=OPENGL, n_images=3, H=40, W=60, **kw):
    cfg = CameraConfig(
        H=H, W=W, grid_size=10, convention=convention,
        pixel_offset=0.5 if convention == OPENCV else 0.0, **kw,
    )
    K = np.array([[50.0, 0, W / 2, 0], [0, 55.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    rng = np.random.RandomState(0)
    axes = rng.randn(n_images, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    R = np.asarray(axis_angle_to_rotation(jnp.asarray(axes), jnp.asarray(rng.rand(n_images))))
    E = np.array(embed_rotation_44(jnp.asarray(R)))
    E[:, :3, 3] = rng.randn(n_images, 3)
    return init_camera(K, E, cfg), K, E


class TestCameraParams:
    def test_zero_noise_reproduces_initials(self):
        cam, K, E = make_camera()
        np.testing.assert_allclose(get_intrinsic(cam), K, atol=1e-5)
        np.testing.assert_allclose(get_extrinsics(cam), E, atol=1e-5)

    def test_additive_intrinsic_noise(self):
        cam, K, _ = make_camera(intrinsics_noise_scale=2.0)
        cam = cam.replace(intrinsics_noise=jnp.array([1.0, 2.0, 3.0, 4.0]))
        K2 = get_intrinsic(cam)
        np.testing.assert_allclose(K2[0, 0], K[0, 0] + 2.0, atol=1e-5)
        np.testing.assert_allclose(K2[1, 2], K[1, 2] + 8.0, atol=1e-5)

    def test_multiplicative_intrinsic_noise(self):
        cam, K, _ = make_camera(multiplicative_noise=True, intrinsics_noise_scale=1.0)
        cam = cam.replace(intrinsics_noise=jnp.array([0.1, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(get_intrinsic(cam)[0, 0], K[0, 0] * 1.1, rtol=1e-6)

    def test_extrinsic_noise_moves_pose(self):
        cam, _, E = make_camera(extrinsics_noise_scale=1e-2)
        noise = jnp.zeros_like(cam.extrinsics_noise).at[1, 6:].set(jnp.array([1.0, 2.0, 3.0]))
        cam = cam.replace(extrinsics_noise=noise)
        E2 = get_extrinsics(cam)
        np.testing.assert_allclose(E2[0], E[0], atol=1e-5)
        np.testing.assert_allclose(E2[1, :3, 3], E[1, :3, 3] + 1e-2 * np.array([1, 2, 3]), atol=1e-5)

    def test_distortion(self):
        cam, _, _ = make_camera(use_distortion=True, distortion_noise_scale=0.5)
        cam = cam.replace(distortion_noise=jnp.array([0.2, -0.4]))
        np.testing.assert_allclose(get_distortion(cam), [0.1, -0.2], atol=1e-6)


def _torch_style_bilinear_upsample(grid, H, W):
    """Numpy oracle for F.interpolate(..., mode='bilinear', align_corners=False)."""
    gh, gw, c = grid.shape
    out = np.zeros((H, W, c), dtype=np.float64)
    for j in range(H):
        for i in range(W):
            sy = max((j + 0.5) * gh / H - 0.5, 0.0)
            sx = max((i + 0.5) * gw / W - 0.5, 0.0)
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            wy, wx = sy - y0, sx - x0
            y1, x1 = min(y0 + 1, gh - 1), min(x0 + 1, gw - 1)
            out[j, i] = (
                grid[y0, x0] * (1 - wy) * (1 - wx)
                + grid[y0, x1] * (1 - wy) * wx
                + grid[y1, x0] * wy * (1 - wx)
                + grid[y1, x1] * wy * wx
            )
    return out


class TestNoiseGrid:
    def test_matches_full_upsample_oracle(self):
        rng = np.random.RandomState(1)
        grid = rng.randn(4, 6, 3)
        H, W = 40, 60
        oracle = _torch_style_bilinear_upsample(grid, H, W)
        py, px = np.mgrid[0:H, 0:W]
        got = sample_noise_grid(
            jnp.asarray(grid, jnp.float32),
            jnp.asarray(px.ravel()), jnp.asarray(py.ravel()), H, W,
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(H, W, 3), oracle, atol=1e-5
        )


class TestRays:
    def test_opengl_matches_no_camera_formula(self):
        """With centered principal point, fx=fy=f and zero noise, the camera
        path must reproduce the classic NeRF dirs ((x-W/2)/f, -(y-H/2)/f, -1)."""
        H, W = 40, 60
        cfg = CameraConfig(H=H, W=W, convention=OPENGL)
        K = np.array([[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.broadcast_to(np.eye(4), (1, 4, 4)).copy()
        E[0, :3, 3] = [1.0, 2.0, 3.0]
        cam = init_camera(K, E, cfg)
        px = jnp.array([0.0, 10.0, 59.0])
        py = jnp.array([0.0, 20.0, 39.0])
        o1, d1 = pixels_to_rays(cam, px, py, image_idx=0, add_noise=False)
        o2, d2 = rays_no_camera(H, W, 50.0, jnp.asarray(E[0]), px, py)
        np.testing.assert_allclose(o1, o2, atol=1e-5)
        np.testing.assert_allclose(d1, d2, atol=1e-5)

    def test_opencv_pinhole_projection_roundtrip(self):
        """A ray generated at pixel p must project back to p through K."""
        cam, K, E = make_camera(convention=OPENCV)
        px = jnp.array([3.0, 30.0, 55.0])
        py = jnp.array([5.0, 17.0, 38.0])
        o, d = pixels_to_rays(cam, px, py, image_idx=1, add_noise=False)
        # Transform a point on the ray back into camera frame and project.
        w2c_R = np.asarray(E[1][:3, :3]).T
        pt_world = np.asarray(o + 2.5 * d)
        pt_cam = (pt_world - np.asarray(E[1][:3, 3])) @ w2c_R.T
        proj = pt_cam @ np.asarray(K[:3, :3]).T
        proj = proj[:, :2] / proj[:, 2:3]
        np.testing.assert_allclose(proj[:, 0], np.asarray(px) + 0.5, atol=1e-4)
        np.testing.assert_allclose(proj[:, 1], np.asarray(py) + 0.5, atol=1e-4)

    def test_ray_noise_changes_and_normalizes(self):
        cam, _, _ = make_camera()
        cam = cam.replace(
            ray_d_grid=jnp.ones_like(cam.ray_d_grid),
            ray_o_grid=jnp.ones_like(cam.ray_o_grid) * 2.0,
        )
        px = jnp.array([5.0])
        py = jnp.array([5.0])
        o0, d0 = pixels_to_rays(cam, px, py, image_idx=0, add_noise=False)
        o1, d1 = pixels_to_rays(cam, px, py, image_idx=0, add_noise=True)
        np.testing.assert_allclose(o1 - o0, 2e-3 * np.ones((1, 3)), atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d1), axis=-1), 1.0, atol=1e-5)

    def test_full_image_shape_and_order(self):
        cam, _, _ = make_camera(H=8, W=12)
        o, d = rays_full_image(cam, image_idx=0)
        assert o.shape == (96, 3) and d.shape == (96, 3)
        # Row-major: first W entries share py=0.
        px = jnp.arange(12, dtype=jnp.float32)
        o2, d2 = pixels_to_rays(cam, px, jnp.zeros(12), image_idx=0)
        np.testing.assert_allclose(d[:12], d2, atol=1e-6)

    def test_radial_distortion_formula(self):
        px, py = apply_radial_distortion(
            jnp.array([30.0]), jnp.array([10.0]), 20.0, 20.0, 0.1, 0.01
        )
        rx = 10.0 / 20.0
        ry = -10.0 / 20.0
        np.testing.assert_allclose(
            px[0], 10.0 * (1 + 0.1 * rx**2 + 0.01 * rx**4) + 20.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            py[0], -10.0 * (1 + 0.1 * ry**2 + 0.01 * ry**4) + 20.0, rtol=1e-6
        )

    @pytest.mark.slow
    def test_gradients_flow_to_all_camera_params(self):
        cam, _, _ = make_camera(use_distortion=True, convention=OPENCV)

        def loss(cam):
            o, d = pixels_to_rays(
                cam, jnp.array([10.0, 20.0]), jnp.array([5.0, 25.0]), image_idx=1
            )
            return jnp.sum(o * o) + jnp.sum(d * d)

        g = jax.grad(loss)(cam)
        assert float(jnp.abs(g.intrinsics_noise).sum()) > 0
        assert float(jnp.abs(g.extrinsics_noise[1]).sum()) > 0
        assert float(jnp.abs(g.extrinsics_noise[0]).sum()) == 0
        assert float(jnp.abs(g.ray_o_grid).sum()) > 0
        assert float(jnp.abs(g.ray_d_grid).sum()) > 0
        assert float(jnp.abs(g.distortion_noise).sum()) > 0


class TestTiedRayNoise:
    """The reference's Distortion camera registers ray_o_noise and
    ray_d_noise from ONE zero tensor (``camera_model.py:224,258-262``):
    in torch both Parameters alias the same storage, which receives both
    Adam updates (each with its own optimizer state) every step. Oracle:
    replicate that exact torch setup and compare one optimization step
    against our two-leaf stop-gradient emulation
    (``CameraConfig.tied_ray_noise``)."""

    def test_matches_torch_shared_storage_adam(self):
        import torch

        torch.manual_seed(0)
        gh, gw, lr = 2, 3, 1e-2
        go = np.random.RandomState(1).randn(gh, gw, 3).astype(np.float32)

        # -- torch oracle: two params aliasing one storage -----------------
        shared = torch.from_numpy(go.copy())
        m = torch.nn.Module()
        m.register_parameter("ray_o_noise", torch.nn.Parameter(shared))
        m.register_parameter("ray_d_noise", torch.nn.Parameter(shared))
        assert m.ray_o_noise.data_ptr() == m.ray_d_noise.data_ptr()
        opt = torch.optim.Adam(m.parameters(), lr=lr)
        # distinct per-path losses (like the o- and d-ray paths)
        loss = (m.ray_o_noise * 2.0).sum() + (m.ray_d_noise ** 2).sum()
        loss.backward()
        opt.step()
        torch_value = m.ray_o_noise.detach().numpy()

        # -- our emulation: two leaves, value = sum, grads split -----------
        def value_o(a, b):
            return a + jax.lax.stop_gradient(b)

        def value_d(a, b):
            return jax.lax.stop_gradient(a) + b

        def loss_fn(leaves):
            a, b = leaves
            return jnp.sum(value_o(a, b) * 2.0) + jnp.sum(value_d(a, b) ** 2)

        import optax

        # both leaves carry the shared init split as (init, 0) so a+b = init
        leaves = (jnp.asarray(go), jnp.zeros_like(jnp.asarray(go)))
        tx = optax.adam(lr)  # optax.adam matches torch.optim.Adam defaults
        opt_state = tx.init(leaves)
        grads = jax.grad(loss_fn)(leaves)
        updates, opt_state = tx.update(grads, opt_state, leaves)
        leaves = optax.apply_updates(leaves, updates)
        ours = np.asarray(leaves[0] + leaves[1])

        np.testing.assert_allclose(ours, torch_value, rtol=1e-5, atol=1e-6)

    def test_camera_paths_read_shared_sum(self):
        cam, K, E = make_camera(convention=OPENCV, tied_ray_noise=True)
        rng = np.random.RandomState(3)
        a = jnp.asarray(rng.randn(*cam.ray_o_grid.shape).astype(np.float32))
        b = jnp.asarray(rng.randn(*cam.ray_d_grid.shape).astype(np.float32))
        cam_t = cam.replace(ray_o_grid=a, ray_d_grid=b)
        # an untied camera whose BOTH grids hold the sum must produce the
        # identical rays
        cam_u = cam.replace(
            config=cam.config.replace(tied_ray_noise=False),
            ray_o_grid=a + b, ray_d_grid=a + b,
        )
        px = jnp.asarray([1.0, 13.0, 37.0])
        py = jnp.asarray([2.0, 17.0, 29.0])
        ro_t, rd_t = pixels_to_rays(cam_t, px, py, image_idx=0)
        ro_u, rd_u = pixels_to_rays(cam_u, px, py, image_idx=0)
        np.testing.assert_allclose(np.asarray(ro_t), np.asarray(ro_u), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rd_t), np.asarray(rd_u), rtol=1e-6)

    def test_gradients_split_per_path(self):
        cam, K, E = make_camera(convention=OPENCV, tied_ray_noise=True)

        def loss(c):
            ro, rd = pixels_to_rays(c, jnp.asarray([5.0]), jnp.asarray([7.0]),
                                    image_idx=0)
            return jnp.sum(ro)  # only the o-path contributes

        g = jax.grad(loss)(cam)
        assert float(jnp.abs(g.ray_o_grid).max()) > 0
        assert float(jnp.abs(g.ray_d_grid).max()) == 0
