"""Numerical parity tests against the REFERENCE implementation itself.

The reference (/root/reference, read-only) is PyTorch; torch-cpu is in this
image, so its pure-math functions can be imported and evaluated directly as
oracles for ours. This is the strongest possible parity evidence: same
inputs, outputs compared to float tolerance. Tests skip when the reference
checkout is absent.

No reference code is copied — modules are imported from the mounted
checkout, with unavailable third-party submodules stubbed out.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


def _load_ref_module(relpath, name, stubs=()):
    import os

    path = os.path.join(REF, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference not mounted: {path}")
    for s in stubs:
        if s not in sys.modules:
            mod = types.ModuleType(s)
            sys.modules[s] = mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_camera_utils(torch):
    # camera_utils imports thirdparty.ATE (empty submodule) — stub it.
    return _load_ref_module(
        "model/camera_utils.py", "ref_camera_utils",
        stubs=("thirdparty", "thirdparty.ATE"),
    )


class TestSO3Parity:
    def test_ortho2rotation(self, torch, ref_camera_utils):
        import jax.numpy as jnp

        from scnerf_tpu.geometry.so3 import ortho2rotation

        rng = np.random.RandomState(0)
        poses = rng.randn(32, 6).astype(np.float32)
        want = ref_camera_utils.ortho2rotation(torch.from_numpy(poses)).numpy()
        got = np.asarray(ortho2rotation(jnp.asarray(poses)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotation2orth(self, torch, ref_camera_utils):
        import jax.numpy as jnp

        from scnerf_tpu.geometry.so3 import ortho2rotation, rotation2orth

        rng = np.random.RandomState(1)
        R = np.asarray(ortho2rotation(jnp.asarray(rng.randn(8, 6).astype(np.float32))))
        want = ref_camera_utils.rotation2orth(torch.from_numpy(R)).numpy()
        got = np.asarray(rotation2orth(jnp.asarray(R)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_axis_angle(self, torch, ref_camera_utils):
        from scnerf_tpu.geometry.so3 import axis_angle_to_rotation
        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        axis = rng.randn(16, 3)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = rng.rand(16, 1) * 3.0
        want = ref_camera_utils.R_axis_angle(axis, angle)
        got = np.asarray(axis_angle_to_rotation(jnp.asarray(axis), jnp.asarray(angle)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rot_from_angle(self, torch, ref_camera_utils):
        from scnerf_tpu.geometry.so3 import euler_to_rotation
        import jax.numpy as jnp

        rng = np.random.RandomState(3)
        euler = rng.randn(8, 3).astype(np.float32)
        want = ref_camera_utils.rot_from_angle(torch.from_numpy(euler)).numpy()
        got = np.asarray(euler_to_rotation(jnp.asarray(euler)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_intrinsic_param_to_K(self, torch, ref_camera_utils):
        from scnerf_tpu.geometry.so3 import intrinsic_param_to_K
        import jax.numpy as jnp

        vals = np.array([415.0, 410.0, 208.0, 151.0], np.float32)
        want = ref_camera_utils.intrinsic_param_to_K(torch.from_numpy(vals)).numpy()
        got = np.asarray(intrinsic_param_to_K(jnp.asarray(vals)))
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.fixture(scope="module")
def ref_render(torch):
    # NeRF/render.py imports get_rays (sibling) — make the dir importable.
    import os

    sys.path.insert(0, os.path.join(REF, "NeRF"))
    try:
        mod = _load_ref_module("NeRF/render.py", "ref_render")
    finally:
        sys.path.pop(0)
    return mod


class TestRenderParity:
    def test_raw2outputs(self, torch, ref_render):
        import jax.numpy as jnp

        from scnerf_tpu.render.composite import raw2outputs

        rng = np.random.RandomState(4)
        raw = rng.randn(16, 32, 4).astype(np.float32)
        z = np.sort(rng.rand(16, 32).astype(np.float32) * 4 + 1, axis=-1)
        rays_d = rng.randn(16, 3).astype(np.float32)
        w_rgb, w_disp, w_acc, w_weights, w_depth = ref_render.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rays_d)
        )
        got = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
        np.testing.assert_allclose(np.asarray(got["rgb"]), w_rgb.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["weights"]), w_weights.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["disp"]), w_disp.numpy(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got["acc"]), w_acc.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["depth"]), w_depth.numpy(), atol=1e-4)

    def test_raw2outputs_white_bkgd(self, torch, ref_render):
        import jax.numpy as jnp

        from scnerf_tpu.render.composite import raw2outputs

        rng = np.random.RandomState(5)
        raw = rng.randn(8, 16, 4).astype(np.float32)
        z = np.sort(rng.rand(8, 16).astype(np.float32) + 1, axis=-1)
        rays_d = rng.randn(8, 3).astype(np.float32)
        w_rgb, *_ = ref_render.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rays_d),
            white_bkgd=True,
        )
        got = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d),
                          white_bkgd=True)
        np.testing.assert_allclose(np.asarray(got["rgb"]), w_rgb.numpy(), atol=1e-5)

    @pytest.mark.slow
    def test_sample_pdf_det(self, torch, ref_render):
        import jax.numpy as jnp

        from scnerf_tpu.sampling.pdf import sample_pdf

        rng = np.random.RandomState(6)
        bins = np.sort(rng.rand(8, 63).astype(np.float32) * 3 + 2, axis=-1)
        weights = rng.rand(8, 62).astype(np.float32)
        want = ref_render.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 64, det=True
        ).numpy()
        got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), 64, det=True))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_ndc_rays(self, torch, ref_render):
        import jax.numpy as jnp

        from scnerf_tpu.geometry.ndc import ndc_rays

        rng = np.random.RandomState(7)
        o = (rng.randn(32, 3) * 0.3 + [0, 0, -2.5]).astype(np.float32)
        d = (rng.randn(32, 3) * 0.1 + [0, 0, -1.0]).astype(np.float32)
        w_o, w_d = ref_render.ndc_rays(
            756, 1008, 815.0, 1.0, torch.from_numpy(o), torch.from_numpy(d)
        )
        g_o, g_d = ndc_rays(756, 1008, 815.0, 815.0, 1.0, jnp.asarray(o), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(g_o), w_o.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_d), w_d.numpy(), atol=1e-4)


@pytest.fixture(scope="module")
def ref_raydist(torch):
    import os

    sys.path.insert(0, REF)
    try:
        mod = _load_ref_module("model/ray_dist_loss.py", "ref_ray_dist_loss")
    finally:
        sys.path.pop(0)
    return mod


class TestPrdParity:
    @pytest.mark.parametrize("mode", ["train", "val"])
    @pytest.mark.parametrize("method", ["NeRF", "NeRF++"])
    def test_proj_ray_dist_loss(self, torch, ref_raydist, mode, method):
        import jax.numpy as jnp

        from scnerf_tpu.losses.prd import prd_loss

        # Consistent two-view geometry so the train mode keeps real matches
        # (pure random rays leave the reference averaging an empty set = nan).
        rng = np.random.RandomState(8)
        M = 64
        H, W = 240, 320
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 260.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        E = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
        E[1, :3, 3] = [0.4, 0.0, 0.0]
        zsign = -1.0 if method == "NeRF" else 1.0
        pts = rng.randn(M, 3).astype(np.float32) * 0.5
        pts[:, 2] = zsign * (4.0 + pts[:, 2])

        def proj(Ei):
            cam = (pts - Ei[:3, 3]) @ Ei[:3, :3]
            fx = -K[0, 0] if method == "NeRF" else K[0, 0]
            u = W / 2 + fx * cam[:, 0] / cam[:, 2]
            v = H / 2 + K[1, 1] * cam[:, 1] / cam[:, 2]
            return np.stack([u, v], -1).astype(np.float32)

        kps0 = proj(E[0]) + rng.randn(M, 2).astype(np.float32) * 0.5
        kps1 = proj(E[1]) + rng.randn(M, 2).astype(np.float32) * 0.5
        o0 = np.broadcast_to(E[0, :3, 3], (M, 3)).astype(np.float32).copy()
        o1 = np.broadcast_to(E[1, :3, 3], (M, 3)).astype(np.float32).copy()
        d0 = (pts - o0 + rng.randn(M, 3) * 1e-3).astype(np.float32)
        d1 = (pts - o1 + rng.randn(M, 3) * 1e-3).astype(np.float32)

        class Args:
            proj_ray_dist_threshold = 5.0

        want_loss, want_n = ref_raydist.proj_ray_dist_loss_single(
            torch.from_numpy(kps0), torch.from_numpy(kps1), 0, 1,
            (torch.from_numpy(o0), torch.from_numpy(d0)),
            (torch.from_numpy(o1), torch.from_numpy(d1)),
            mode, "cpu", H, W, Args(),
            intrinsic=torch.from_numpy(K.copy()),
            extrinsic=torch.from_numpy(E.copy()),
            method=method,
        )
        got_loss, got_n = prd_loss(
            jnp.asarray(kps0), jnp.asarray(kps1),
            (jnp.asarray(o0), jnp.asarray(d0)),
            (jnp.asarray(o1), jnp.asarray(d1)),
            jnp.asarray(K), jnp.asarray(E),
            threshold=5.0, method=method, mode=mode,
        )
        np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-4)
        if mode == "train":
            assert int(got_n) == int(want_n)


@pytest.fixture(scope="module")
def ref_get_rays(torch):
    return _load_ref_module("NeRF/get_rays.py", "ref_get_rays")


class TestRayParity:
    def test_get_rays_no_camera(self, torch, ref_get_rays):
        import jax.numpy as jnp

        from scnerf_tpu.camera.rays import rays_no_camera

        H, W, f = 24, 32, 30.0
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [1, 2, 3]
        w_o, w_d = ref_get_rays.get_rays_full_image_no_camera(
            H, W, f, torch.from_numpy(E)
        )
        g_o, g_d = rays_no_camera(H, W, f, jnp.asarray(E))
        np.testing.assert_allclose(
            np.asarray(g_d).reshape(H, W, 3), w_d.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_o).reshape(H, W, 3), w_o.numpy(), atol=1e-6
        )

    def test_get_rays_kps_vs_camera_path(self, torch, ref_get_rays):
        """Our OPENGL camera path vs the reference's kps-no-camera variant
        (centered principal point, fx=fy)."""
        import jax.numpy as jnp

        from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera, pixels_to_rays

        H, W, f = 24, 32, 30.0
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [0.5, -0.2, 1.0]
        kps = np.stack([
            np.random.RandomState(9).randint(0, W, 16),
            np.random.RandomState(10).randint(0, H, 16),
        ], axis=-1).astype(np.float32)
        w_o, w_d = ref_get_rays.get_rays_kps_no_camera(
            H, W, f, torch.from_numpy(E), torch.from_numpy(kps)
        )
        K = np.array([[f, 0, W / 2, 0], [0, f, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        cam = init_camera(K, E[None], CameraConfig(H=H, W=W, convention=OPENGL))
        g_o, g_d = pixels_to_rays(
            cam, jnp.asarray(kps[:, 0]), jnp.asarray(kps[:, 1]), image_idx=0,
            add_noise=False,
        )
        np.testing.assert_allclose(np.asarray(g_d), w_d.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_o), w_o.numpy(), atol=1e-6)


@pytest.fixture(scope="module")
def ref_lookup(torch):
    return _load_ref_module("model/lookup.py", "ref_lookup")


class TestLookupParity:
    def test_undistort_pixels(self, torch, ref_lookup):
        import jax.numpy as jnp

        from scnerf_tpu.camera.distortion import undistort_pixels

        W, H = 320, 240
        k = np.array([0.1, -0.02], np.float32)
        rng = np.random.RandomState(11)
        x = (rng.rand(64) * (W - 20) + 10).astype(np.float32)
        y = (rng.rand(64) * (H - 20) + 10).astype(np.float32)
        want_valid, want_xy = ref_lookup.lookup(
            W, H, torch.from_numpy(k), torch.from_numpy(x), torch.from_numpy(y), "cpu"
        )
        got_valid, got_xy = undistort_pixels(W, H, jnp.asarray(k), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_array_equal(np.asarray(got_valid), want_valid.numpy())
        np.testing.assert_allclose(np.asarray(got_xy), want_xy.numpy(), atol=1e-3)


@pytest.fixture(scope="module")
def ref_ddp_model(torch):
    import os

    sys.path.insert(0, os.path.join(REF, "nerfplusplus"))
    try:
        mod = _load_ref_module("nerfplusplus/ddp_model.py", "ref_ddp_model")
    finally:
        sys.path.pop(0)
    return mod


class TestNerfPPGeometryParity:
    def test_depth2pts_outside(self, torch, ref_ddp_model):
        import jax.numpy as jnp

        from scnerf_tpu.geometry.sphere import depth2pts_outside

        rng = np.random.RandomState(12)
        o = (rng.randn(32, 8, 3) * 0.2).astype(np.float32)
        d = rng.randn(32, 8, 3).astype(np.float32)
        depth = rng.rand(32, 8).astype(np.float32) * 0.9 + 0.05
        w_pts, w_real = ref_ddp_model.depth2pts_outside(
            torch.from_numpy(o), torch.from_numpy(d), torch.from_numpy(depth)
        )
        g_pts, g_real = depth2pts_outside(jnp.asarray(o), jnp.asarray(d), jnp.asarray(depth))
        np.testing.assert_allclose(np.asarray(g_pts), w_pts.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_real), w_real.numpy(), rtol=2e-4)

    def test_nerfpp_embedder(self, torch):
        import jax.numpy as jnp

        from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding

        ref_net = _load_ref_module("nerfplusplus/nerf_network.py", "ref_nerf_network2")
        emb = ref_net.Embedder(input_dim=4, max_freq_log2=9, N_freqs=10)
        rng = np.random.RandomState(13)
        x = rng.randn(16, 4).astype(np.float32)
        want = emb(torch.from_numpy(x)).numpy()
        got = np.asarray(positional_encoding(jnp.asarray(x), EncodingConfig(4, 10)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nerfpp_sample_pdf(self, torch):
        """Our ``variant="nerfpp"`` vs the reference's own NeRF++
        ``sample_pdf`` (``ddp_train_nerf.py:83-132``): TINY_NUMBER eps on
        weights/denom, the widened-bin lerp, and the first-M index
        semantics (det linspace includes u=1.0, exercising the tail where
        u >= cdf[-1])."""
        import importlib.util
        import os

        import jax.numpy as jnp

        from scnerf_tpu.sampling.pdf import sample_pdf

        # Extract the reference's sample_pdf without importing the full
        # trainer module (which would pull wandb/config machinery): compile
        # the file but execute only up to the function we need via a
        # namespace exec of its source AST... simpler: import with stubs.
        path = os.path.join(REF, "nerfplusplus", "ddp_train_nerf.py")
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        import ast

        src = open(path).read()
        tree = ast.parse(src)
        wanted = [n for n in tree.body
                  if isinstance(n, ast.FunctionDef) and n.name == "sample_pdf"]
        ns = {"torch": torch, "TINY_NUMBER": 1e-6}
        exec(compile(ast.Module(body=wanted, type_ignores=[]), path, "exec"), ns)
        ref_sample_pdf = ns["sample_pdf"]

        rng = np.random.RandomState(21)
        n, M = 64, 7  # bins M+1=8, weights M=7 (cascade 8+8 shapes)
        bins = np.sort(rng.rand(n, M + 1).astype(np.float32) * 4.0, axis=-1)
        weights = (rng.rand(n, M).astype(np.float32) ** 4) * 2.0
        weights[:4] = 0.0  # all-zero rows: eps path + denom guard
        want = ref_sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 8, det=True
        ).numpy()
        got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                    8, det=True, variant="nerfpp"))
        # f32 cumsum order differs between torch and XLA (same last-ulp
        # class the reference shows between its own CPU/CUDA backends);
        # tolerance covers in-bin lerp rounding, still far below bin width.
        np.testing.assert_allclose(got, want, atol=5e-4)

        # Injected-u path (the trajectory-replay mechanism) against the
        # reference's random path fed the same uniforms.
        u = rng.rand(n, 8).astype(np.float32)
        torch_u = torch.from_numpy(u)
        orig_rand = torch.rand
        try:
            torch.rand = lambda *a, **k: torch_u
            want_u = ref_sample_pdf(
                torch.from_numpy(bins), torch.from_numpy(weights), 8, det=False
            ).numpy()
        finally:
            torch.rand = orig_rand
        got_u = np.asarray(sample_pdf(None, jnp.asarray(bins),
                                      jnp.asarray(weights), 8,
                                      u=jnp.asarray(u), variant="nerfpp"))
        np.testing.assert_allclose(got_u, want_u, atol=5e-4)


@pytest.fixture(scope="module")
def ref_load_llff(torch):
    # load_llff.py does `from camera_model import make_rand_axis, R_axis_angle`
    # (only used by its noise injector, which we don't exercise) — stub it.
    stub = types.ModuleType("camera_model")
    stub.make_rand_axis = lambda *a, **k: None
    stub.R_axis_angle = lambda *a, **k: None
    sys.modules.setdefault("camera_model", stub)
    return _load_ref_module("NeRF/load_llff.py", "ref_load_llff")


class TestLLFFPoseParity:
    """Oracle tests pinning our re-derived pose pipeline to the reference's
    (Fyusion/LLFF-inherited) numerics: round-1 VERDICT required data/llff.py's
    pose block be rewritten in our own idiom with parity pinned here."""

    @staticmethod
    def _random_capture(rng, n=12, inward=False):
        """(n, 3, 5) c2w|hwf poses: cameras scattered, roughly +z-aligned
        (forward-facing) or looking at the origin (inward 360 capture)."""
        centers = rng.randn(n, 3) * (2.0 if inward else 0.3)
        if inward:
            fwd = centers / np.linalg.norm(centers, axis=-1, keepdims=True)
        else:
            fwd = np.stack([rng.randn(n) * 0.2, rng.randn(n) * 0.2, np.ones(n)], -1)
            fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
        up_hint = np.array([0.0, 1.0, 0.05])
        right = np.cross(up_hint, fwd)
        right /= np.linalg.norm(right, axis=-1, keepdims=True)
        up = np.cross(fwd, right)
        poses = np.stack([right, up, fwd, centers], axis=-1).astype(np.float32)
        hwf = np.broadcast_to(np.array([[756.0], [1008.0], [815.0]], np.float32), (n, 3, 1))
        return np.concatenate([poses, hwf], axis=-1)

    def test_average_pose(self, ref_load_llff):
        from scnerf_tpu.data.llff import average_pose

        rng = np.random.RandomState(7)
        poses = self._random_capture(rng)
        np.testing.assert_allclose(
            average_pose(poses), ref_load_llff.poses_avg(poses), atol=1e-6
        )

    def test_recenter_poses(self, ref_load_llff):
        from scnerf_tpu.data.llff import recenter_poses

        rng = np.random.RandomState(8)
        poses = self._random_capture(rng)
        np.testing.assert_allclose(
            recenter_poses(poses), ref_load_llff.recenter_poses(poses), atol=1e-5
        )

    def test_render_path_spiral(self, ref_load_llff):
        from scnerf_tpu.data.llff import average_pose, render_path_spiral, _unit

        rng = np.random.RandomState(9)
        poses = self._random_capture(rng)
        c2w = average_pose(poses)
        up = _unit(poses[:, :3, 1].sum(0))
        rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
        ours = render_path_spiral(c2w, up, rads, focal=3.1, zrate=0.5, rots=2, N=120)
        ref = ref_load_llff.render_path_spiral(
            c2w, up, rads, focal=3.1, zdelta=None, zrate=0.5, rots=2, N=120
        )
        np.testing.assert_allclose(ours, np.stack(ref, 0), atol=1e-6)

    def test_spherify_poses(self, ref_load_llff):
        from scnerf_tpu.data.llff import spherify_poses

        rng = np.random.RandomState(10)
        poses = self._random_capture(rng, inward=True)
        bds = np.stack([np.full(12, 1.2), np.full(12, 9.0)], -1).astype(np.float32)
        ours_poses, ours_path, ours_bds = spherify_poses(poses, bds)
        ref_poses, ref_path, ref_bds = ref_load_llff.spherify_poses(poses, bds)
        np.testing.assert_allclose(ours_poses, ref_poses, atol=1e-5)
        np.testing.assert_allclose(ours_path, ref_path, atol=1e-5)
        np.testing.assert_allclose(ours_bds, ref_bds, atol=1e-6)
