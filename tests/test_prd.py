"""Projected-ray-distance loss tests.

Strategy: synthesize a scene of known 3D points, project them with ground
truth cameras into two views to get *perfect* correspondences, and check PRD
is ~0 with the true camera, positive with a perturbed one, and differentiable
back to camera parameters.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera import (
    OPENGL,
    CameraConfig,
    OPENCV,
    get_extrinsic,
    get_intrinsic,
    init_camera,
    pixels_to_rays,
)
from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
from scnerf_tpu.losses.prd import prd_loss
from scnerf_tpu.matching.pairs import image_pair_candidates, flatten_pairs


def make_scene(n_pts=64, H=240, W=320):
    rng = np.random.RandomState(3)
    cfg = CameraConfig(H=H, W=W, convention=OPENCV, pixel_offset=0.5)
    K = np.array([[260.0, 0, W / 2, 0], [0, 260.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    # Two cameras looking at points around z~4, slightly rotated/offset.
    E = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
    E[1] = np.array(
        embed_rotation_44(
            axis_angle_to_rotation(jnp.array([[0.0, 1.0, 0.0]]), jnp.array([0.08]))
        )
    )[0]
    E[1, :3, 3] = [0.4, 0.05, 0.0]
    pts = rng.randn(n_pts, 3) * np.array([0.8, 0.6, 0.3]) + np.array([0, 0, 4.0])

    def project(E_i):
        w2c_R = E_i[:3, :3].T
        cam = (pts - E_i[:3, 3]) @ w2c_R.T
        pix = cam @ K[:3, :3].T
        return (pix[:, :2] / pix[:, 2:3]).astype(np.float32)

    kps0 = project(E[0]) - 0.5  # remove the half-pixel convention offset
    kps1 = project(E[1]) - 0.5
    cam = init_camera(K, E, cfg)
    return cam, kps0, kps1


def rays_at(cam, kps, idx):
    return pixels_to_rays(cam, jnp.asarray(kps[:, 0]), jnp.asarray(kps[:, 1]),
                          image_idx=idx, add_noise=False)


class TestPrd:
    @pytest.mark.slow
    def test_zero_for_ground_truth_camera(self):
        cam, kps0, kps1 = make_scene()
        r0 = rays_at(cam, kps0, 0)
        r1 = rays_at(cam, kps1, 1)
        K = get_intrinsic(cam)
        E = get_extrinsic(cam, jnp.array([0, 1]))
        # kps in the loss are the *distorted pixel* coordinates incl. offset.
        k0 = jnp.asarray(kps0) + 0.5
        k1 = jnp.asarray(kps1) + 0.5
        loss, n = prd_loss(k0, k1, r0, r1, K, E, method="NeRF++", mode="train")
        assert float(loss) < 1e-3, float(loss)
        assert int(n) == kps0.shape[0]

    def test_positive_for_perturbed_camera(self):
        cam, kps0, kps1 = make_scene()
        bad = cam.replace(extrinsics_noise=cam.extrinsics_noise.at[1, 7].set(5.0))
        r0 = rays_at(bad, kps0, 0)
        r1 = rays_at(bad, kps1, 1)
        K = get_intrinsic(bad)
        E = get_extrinsic(bad, jnp.array([0, 1]))
        loss, _ = prd_loss(
            jnp.asarray(kps0) + 0.5, jnp.asarray(kps1) + 0.5, r0, r1, K, E,
            method="NeRF++", mode="val",
        )
        assert float(loss) > 0.01

    @pytest.mark.slow
    def test_padding_mask_excludes_garbage(self):
        cam, kps0, kps1 = make_scene(n_pts=32)
        pad0 = np.concatenate([kps0, np.full((8, 2), 1e3, np.float32)])
        pad1 = np.concatenate([kps1, np.full((8, 2), -1e3, np.float32)])
        mask = np.concatenate([np.ones(32, bool), np.zeros(8, bool)])
        r0 = rays_at(cam, pad0, 0)
        r1 = rays_at(cam, pad1, 1)
        K = get_intrinsic(cam)
        E = get_extrinsic(cam, jnp.array([0, 1]))
        loss, n = prd_loss(
            jnp.asarray(pad0) + 0.5, jnp.asarray(pad1) + 0.5, r0, r1, K, E,
            mask=jnp.asarray(mask), method="NeRF++", mode="train",
        )
        assert float(loss) < 1e-3
        assert int(n) <= 32

    def test_eval_clamps_outliers(self):
        cam, kps0, kps1 = make_scene(n_pts=16)
        # Corrupt half the correspondences mildly: rays stay chirality-valid
        # but the reprojection error exceeds the threshold -> clamped to 5.
        kps1c = kps1.copy()
        kps1c[:8, 0] += 25.0
        r0 = rays_at(cam, kps0, 0)
        r1 = rays_at(cam, kps1c, 1)
        K = get_intrinsic(cam)
        E = get_extrinsic(cam, jnp.array([0, 1]))
        loss, n = prd_loss(
            jnp.asarray(kps0) + 0.5, jnp.asarray(kps1c) + 0.5, r0, r1, K, E,
            method="NeRF++", mode="val", threshold=5.0,
        )
        n_valid = float(n)
        assert n_valid >= 8  # clean half always valid
        # Every clamped outlier contributes exactly 5.0; clean ones ~0.
        expected_max = 5.0 * (n_valid - 8) / n_valid + 0.01
        assert 0.0 < float(loss) <= expected_max + 5.0 * 8 / n_valid
        # Badly corrupted-but-chirality-valid entries are clamped, so the
        # loss can never exceed the threshold.
        assert float(loss) <= 5.0

    @pytest.mark.slow
    def test_grad_reaches_camera(self):
        cam, kps0, kps1 = make_scene()

        def f(cam):
            r0 = rays_at(cam, kps0, 0)
            r1 = rays_at(cam, kps1, 1)
            loss, _ = prd_loss(
                jnp.asarray(kps0) + 0.5, jnp.asarray(kps1) + 0.5, r0, r1,
                get_intrinsic(cam), get_extrinsic(cam, jnp.array([0, 1])),
                method="NeRF++", mode="train",
            )
            return loss

        g = jax.grad(f)(cam)
        assert np.isfinite(float(jnp.abs(g.extrinsics_noise).sum()))
        assert float(jnp.abs(g.intrinsics_noise).sum()) > 0


class TestPairs:
    def test_pair_candidates_by_angle(self):
        R0 = np.eye(3)
        R1 = np.array(axis_angle_to_rotation(jnp.array([[0, 0, 1.0]]), jnp.array([0.1])))[0]
        R2 = np.array(axis_angle_to_rotation(jnp.array([[0, 0, 1.0]]), jnp.array([2.0])))[0]
        E = np.broadcast_to(np.eye(4), (3, 4, 4)).copy()
        E[0, :3, :3], E[1, :3, :3], E[2, :3, :3] = R0, R1, R2
        pairs = image_pair_candidates(E, angle_threshold_deg=30.0)
        assert set(pairs[0]) == {1} and set(pairs[1]) == {0}
        assert 2 not in pairs
        flat = flatten_pairs(pairs)
        assert flat.tolist() == [[0, 1]]

    def test_i_map_remap(self):
        E = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
        pairs = image_pair_candidates(E, 30.0, i_map=np.array([5, 9]))
        assert set(pairs.keys()) == {5, 9}


class TestPrdDegenerate:
    @pytest.mark.slow
    def test_identical_cameras_finite_gradients(self):
        """run_without_colmap=both init: every camera at identity/origin.
        Rays are parallel, triangulation is degenerate — the loss must be
        finite AND its gradient must be finite (regression: NaN leaked
        through jnp.where gradients before clamping)."""
        H = W = 64
        cfg = CameraConfig(H=H, W=W, grid_size=8, convention=OPENGL,
                           extrinsics_noise_scale=1.0)
        K = np.array([[float(W), 0, W / 2, 0], [0, float(H), H / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.broadcast_to(np.eye(4), (3, 4, 4)).copy()
        cam = init_camera(K, E, cfg)
        rng = np.random.RandomState(0)
        kps0 = (rng.rand(32, 2) * [W - 1, H - 1]).astype(np.float32)
        kps1 = (rng.rand(32, 2) * [W - 1, H - 1]).astype(np.float32)

        def f(cam):
            r0 = pixels_to_rays(cam, jnp.asarray(kps0[:, 0]), jnp.asarray(kps0[:, 1]), image_idx=0)
            r1 = pixels_to_rays(cam, jnp.asarray(kps1[:, 0]), jnp.asarray(kps1[:, 1]), image_idx=1)
            loss, n = prd_loss(
                jnp.asarray(kps0), jnp.asarray(kps1), r0, r1,
                get_intrinsic(cam), get_extrinsic(cam, jnp.array([0, 1])),
                method="NeRF", mode="train",
            )
            return jnp.where(n > 0, loss, 0.0)

        val, g = jax.value_and_grad(f)(cam)
        assert np.isfinite(float(val))
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all(), "NaN/Inf in PRD gradient"


class TestDistortionAwarePrd:
    """The distortion-aware PRD variant (losses/prd.py: the reference's
    commented-out ray_dist_loss.py:188-199 path, implemented): projections
    are mapped through the inverse-distortion lookup before comparison,
    which makes the radial k observable through PRD."""

    K_GT = np.array([0.06, -0.02], np.float32)

    def _scene(self, n_pts=64, H=240, W=320):
        from scnerf_tpu.camera.distortion import undistort_pixels

        rng = np.random.RandomState(6)
        cfg = CameraConfig(H=H, W=W, convention=OPENCV, pixel_offset=0.5,
                           use_distortion=True)
        K = np.array([[260.0, 0, W / 2, 0], [0, 260.0, H / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        E = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
        E[1] = np.array(embed_rotation_44(axis_angle_to_rotation(
            jnp.array([[0.0, 1.0, 0.0]]), jnp.array([0.08]))))[0]
        E[1, :3, 3] = [0.4, 0.05, 0.0]
        # wide spread so the radial warp moves edge points by several px
        pts = rng.randn(n_pts, 3) * np.array([0.85, 0.65, 0.3]) + np.array([0, 0, 4.0])
        k = jnp.asarray(self.K_GT)

        def raw_kps(E_i):
            """SIFT-like raw pixel coords: pinhole projection (warped space)
            mapped through the inverse lookup."""
            cam_pts = (pts - E_i[:3, 3]) @ E_i[:3, :3]
            pix = cam_pts @ K[:3, :3].T
            warped = pix[:, :2] / pix[:, 2:3]
            valid, xy = undistort_pixels(W, H, k, jnp.asarray(warped[:, 0]),
                                         jnp.asarray(warped[:, 1]))
            return np.asarray(valid), np.asarray(xy, np.float32)

        v0, kps0_u = raw_kps(E[0])
        v1, kps1_u = raw_kps(E[1])
        keep = v0 & v1  # only points invertible in both views
        kps0_u, kps1_u = kps0_u[keep], kps1_u[keep]
        assert keep.sum() > 40, keep.sum()
        cam = init_camera(K, E, cfg, k=np.asarray(self.K_GT))
        return cam, kps0_u, kps1_u

    def _prd(self, cam, kps0_u, kps1_u, k_for_loss):
        from scnerf_tpu.losses.prd import prd_loss

        r0 = pixels_to_rays(cam, jnp.asarray(kps0_u[:, 0]) - 0.5,
                            jnp.asarray(kps0_u[:, 1]) - 0.5, image_idx=0,
                            add_noise=False)
        r1 = pixels_to_rays(cam, jnp.asarray(kps1_u[:, 0]) - 0.5,
                            jnp.asarray(kps1_u[:, 1]) - 0.5, image_idx=1,
                            add_noise=False)
        W, H = cam.config.W, cam.config.H
        loss, n = prd_loss(
            jnp.asarray(kps0_u), jnp.asarray(kps1_u), r0, r1,
            get_intrinsic(cam), get_extrinsic(cam, jnp.array([0, 1])),
            method="NeRF++", mode="val", threshold=100.0,
            distortion_k=k_for_loss, image_wh=(W, H),
        )
        return float(loss), float(n)

    @pytest.mark.slow
    def test_gt_k_scores_near_zero(self):
        cam, kps0_u, kps1_u = self._scene()
        from scnerf_tpu.camera.model import get_distortion

        loss, n = self._prd(cam, kps0_u, kps1_u, get_distortion(cam))
        assert n > 32
        assert loss < 1e-2, loss

    def test_wrong_k_scores_high(self):
        """Clamping-free comparison: evaluating with k=0 while the data was
        made by k_gt must blow the PRD up — i.e. k is observable."""
        cam, kps0_u, kps1_u = self._scene()
        loss_gt, _ = self._prd(cam, kps0_u, kps1_u, jnp.asarray(self.K_GT))
        loss_zero, _ = self._prd(cam, kps0_u, kps1_u, jnp.zeros(2))
        assert loss_zero > 50 * max(loss_gt, 1e-4), (loss_gt, loss_zero)

    @pytest.mark.slow
    def test_k_gradient_nonzero(self):
        """d(PRD)/d(distortion_noise) must be nonzero — the property the
        reference's commented-out path was meant to provide."""
        from scnerf_tpu.camera.model import get_distortion
        from scnerf_tpu.losses.prd import prd_loss

        cam, kps0_u, kps1_u = self._scene()
        cam_off = cam.replace(distortion_noise=jnp.asarray([2.0, -1.0]))  # k shift 0.02 at scale 1e-2
        W, H = cam.config.W, cam.config.H

        def f(noise):
            c = cam_off.replace(distortion_noise=noise)
            r0 = pixels_to_rays(c, jnp.asarray(kps0_u[:, 0]) - 0.5,
                                jnp.asarray(kps0_u[:, 1]) - 0.5, image_idx=0,
                                add_noise=False)
            r1 = pixels_to_rays(c, jnp.asarray(kps1_u[:, 0]) - 0.5,
                                jnp.asarray(kps1_u[:, 1]) - 0.5, image_idx=1,
                                add_noise=False)
            loss, _ = prd_loss(
                jnp.asarray(kps0_u), jnp.asarray(kps1_u), r0, r1,
                get_intrinsic(c), get_extrinsic(c, jnp.array([0, 1])),
                method="NeRF++", mode="val", threshold=100.0,
                distortion_k=get_distortion(c), image_wh=(W, H),
            )
            return loss

        g = jax.grad(f)(cam_off.distortion_noise)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.linalg.norm(np.asarray(g)) > 1e-4, g
        # descending the gradient reduces the loss (sanity)
        eps = 1e-3
        noise = cam_off.distortion_noise
        assert float(f(noise - eps * g / jnp.linalg.norm(g))) < float(f(noise))
