"""Projected-ray-distance loss tests.

Strategy: synthesize a scene of known 3D points, project them with ground
truth cameras into two views to get *perfect* correspondences, and check PRD
is ~0 with the true camera, positive with a perturbed one, and differentiable
back to camera parameters.
"""
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
