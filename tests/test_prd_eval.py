"""PRD-evaluation tests: GT filtering and pair-mean semantics."""
import pytest
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera import get_extrinsic, get_intrinsic, pixels_to_rays
from scnerf_tpu.losses.prd_eval import filter_matches_with_gt, prd_evaluation
from scnerf_tpu.matching.provider import PairMatches, PrecomputedMatches
from tests.test_prd import make_scene


def build_cache_and_rays(cam, kps0, kps1, corrupt_first=0):
    kps1c = kps1.copy()
    if corrupt_first:
        kps1c[:corrupt_first] += 40.0
    cache = PrecomputedMatches()
    cache.put(0, 1, PairMatches((kps0 + 0.5).astype(np.float32), (kps1c + 0.5).astype(np.float32)))

    def rays(kps, idx):
        return pixels_to_rays(cam, kps[:, 0] - 0.5, kps[:, 1] - 0.5, image_idx=idx,
                              add_noise=False)

    return cache, rays


class TestGtFilter:
    def test_keeps_good_drops_bad(self):
        cam, kps0, kps1 = make_scene(n_pts=32)
        kps1c = kps1.copy()
        kps1c[:8] += 40.0  # bad matches
        r0 = pixels_to_rays(cam, jnp.asarray(kps0[:, 0]), jnp.asarray(kps0[:, 1]),
                            image_idx=0, add_noise=False)
        r1 = pixels_to_rays(cam, jnp.asarray(kps1c[:, 0]), jnp.asarray(kps1c[:, 1]),
                            image_idx=1, add_noise=False)
        keep = filter_matches_with_gt(
            jnp.asarray(kps0) + 0.5, jnp.asarray(kps1c) + 0.5, r0, r1,
            get_intrinsic(cam), get_extrinsic(cam, jnp.array([0, 1])), "NeRF++",
        )
        keep = np.asarray(keep)
        assert keep[8:].all()
        assert not keep[:8].any()


class TestPrdEvaluation:
    @pytest.mark.slow
    def test_gt_camera_scores_near_zero(self):
        cam, kps0, kps1 = make_scene()
        cache, rays = build_cache_and_rays(cam, kps0, kps1)
        K = get_intrinsic(cam)
        E = np.stack([np.asarray(get_extrinsic(cam, i)) for i in range(2)])
        val = prd_evaluation(
            np.array([[0, 1]]), cache, rays, K, E,
            mode="train", method="NeRF++", max_matches=128,
        )
        assert val < 1e-3

    def test_val_mode_filters_corrupt_and_clamps(self):
        cam, kps0, kps1 = make_scene()
        cache, rays = build_cache_and_rays(cam, kps0, kps1, corrupt_first=16)
        K = get_intrinsic(cam)
        E = np.stack([np.asarray(get_extrinsic(cam, i)) for i in range(2)])
        val = prd_evaluation(
            np.array([[0, 1]]), cache, rays, K, E,
            mode="val", method="NeRF++",
            rays_gt=rays, gt_K=K, gt_E=E, max_matches=128,
        )
        # GT filter removed the corrupt matches -> clean mean ~0.
        assert val < 1e-3

    def test_perturbed_camera_scores_positive(self):
        cam, kps0, kps1 = make_scene()
        bad = cam.replace(extrinsics_noise=cam.extrinsics_noise.at[1, 8].set(30.0))

        cache, rays_gt = build_cache_and_rays(cam, kps0, kps1)

        def rays_bad(kps, idx):
            return pixels_to_rays(bad, kps[:, 0] - 0.5, kps[:, 1] - 0.5,
                                  image_idx=idx, add_noise=False)

        K = get_intrinsic(bad)
        E_bad = np.stack([np.asarray(get_extrinsic(bad, i)) for i in range(2)])
        E_gt = np.stack([np.asarray(get_extrinsic(cam, i)) for i in range(2)])
        val = prd_evaluation(
            np.array([[0, 1]]), cache, rays_bad, K, E_bad,
            mode="val", method="NeRF++",
            rays_gt=rays_gt, gt_K=get_intrinsic(cam), gt_E=E_gt, max_matches=128,
        )
        assert 0.01 < val <= 5.0

    def test_empty_cache_gives_nan(self):
        cam, kps0, kps1 = make_scene()
        cache = PrecomputedMatches()
        _, rays = build_cache_and_rays(cam, kps0, kps1)
        K = get_intrinsic(cam)
        E = np.stack([np.asarray(get_extrinsic(cam, i)) for i in range(2)])
        val = prd_evaluation(np.array([[0, 1]]), cache, rays, K, E,
                             mode="train", method="NeRF++")
        assert np.isnan(val)
