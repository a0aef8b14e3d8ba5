"""Projected-ray-distance evaluation over image pairs.

Rebuild of ``projected_ray_distance_evaluation`` and
``filter_matches_with_gt`` (``/root/reference/model/prd_evaluation.py:66-332``;
a second NeRF++-specific copy lives at ``nerfplusplus/ddp_test_nerf.py:
32-116``): for every feasible pair of the evaluated split, take the cached
correspondences, (val/test) keep only matches that the *ground-truth* camera
triangulates to < 1 px reprojection error in both directions with positive
ray parameters, then compute the clamped PRD with the *evaluated* camera;
report the NaN-skipped mean over pairs.

Matching runs offline (``matching/provider.py``); this module is pure jax
over padded tensors plus a small host loop over pairs.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from scnerf_tpu.losses.prd import prd_loss, prd_pointwise
from scnerf_tpu.matching.provider import PrecomputedMatches, pad_matches

GT_FILTER_THRESHOLD = 1.0  # px^2, prd_evaluation.py:331


def filter_matches_with_gt(
    kps0,
    kps1,
    rays0_gt,
    rays1_gt,
    gt_K,
    gt_E_pair,
    method: str,
) -> jnp.ndarray:
    """Boolean keep-mask: GT-camera PRD < 1 px both ways + chirality."""
    loss0, loss1, chirality = prd_pointwise(
        kps0, kps1, rays0_gt, rays1_gt, gt_K, gt_E_pair, method=method
    )
    return (loss0 < GT_FILTER_THRESHOLD) & (loss1 < GT_FILTER_THRESHOLD) & (chirality > 0)


def prd_evaluation(
    pairs: np.ndarray,
    match_cache: PrecomputedMatches,
    rays_eval: Callable,
    K_eval,
    E_eval,
    mode: str,
    method: str,
    rays_gt: Callable | None = None,
    gt_K=None,
    gt_E=None,
    max_matches: int = 1024,
    threshold: float = 5.0,
) -> float:
    """Mean PRD over feasible pairs.

    Args:
      pairs: ``(P, 2)`` image-index pairs (i < j).
      match_cache: correspondence store.
      rays_eval: ``(kps (M, 2), img_idx) -> (o, d)`` with the evaluated
        camera (noise included).
      K_eval, E_eval: evaluated 4x4 K and per-image (N, 4, 4) extrinsics
        (for val/test with a camera model, E_eval are the GT extrinsics —
        the reference's parameter contract, ``ray_dist_loss.py:77-93``).
      mode: "train" | "val" | "test" (val/test filter with GT + clamp).
      rays_gt / gt_K / gt_E: GT-camera ray function + parameters, required
        for the val/test match filter.
    Returns:
      NaN-skipped mean PRD (float); NaN when no pair produced a value.
    """
    vals = []
    for i, j in np.asarray(pairs):
        i, j = int(i), int(j)
        m = match_cache.get(i, j)
        if m is None or m.kps0.shape[0] == 0:
            continue
        kps0, kps1, mask = pad_matches(m, max_matches)
        kps0 = jnp.asarray(kps0)
        kps1 = jnp.asarray(kps1)
        mask = jnp.asarray(mask)

        if mode in ("val", "test"):
            assert rays_gt is not None and gt_K is not None and gt_E is not None
            r0g = rays_gt(kps0, i)
            r1g = rays_gt(kps1, j)
            keep = filter_matches_with_gt(
                kps0, kps1, r0g, r1g, jnp.asarray(gt_K),
                jnp.asarray(gt_E)[jnp.asarray([i, j])], method,
            )
            mask = mask & keep

        r0 = rays_eval(kps0, i)
        r1 = rays_eval(kps1, j)
        loss, n = prd_loss(
            kps0, kps1, r0, r1,
            jnp.asarray(K_eval), jnp.asarray(E_eval)[jnp.asarray([i, j])],
            mask=mask, threshold=threshold, method=method, mode=mode,
        )
        loss = float(loss)
        if np.isfinite(loss) and float(n) > 0:
            vals.append(loss)
    return float(np.mean(vals)) if vals else float("nan")
