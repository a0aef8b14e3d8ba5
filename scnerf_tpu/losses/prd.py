"""Projected Ray Distance (PRD) — the paper's geometric calibration loss.

Rebuild of ``proj_ray_dist_loss_single``
(``/root/reference/model/ray_dist_loss.py:22-246``), redesigned for XLA:
variable-length match lists and boolean-gather filtering become fixed-size
padded batches with validity masks (``jnp.where`` masking, static shapes), so
the loss jits and differentiates inside the train step.

Math (unchanged from the reference): for each correspondence, take the two
camera rays, find the closest points between them in closed form, project
each point into the *other* camera, and penalize the squared pixel distance
to the matched keypoint; drop (train) or clamp (eval) outliers beyond
``threshold``; filter out points behind either camera (chirality).
"""
from __future__ import annotations

import jax.numpy as jnp

from scnerf_tpu.geometry.so3 import se3_inverse

_EPS = 1e-10


def prd_pointwise(
    kps0: jnp.ndarray,
    kps1: jnp.ndarray,
    rays0: tuple,
    rays1: tuple,
    K: jnp.ndarray,
    extrinsics_pair: jnp.ndarray,
    method: str = "NeRF",
    distortion_k: jnp.ndarray | None = None,
    image_wh: tuple | None = None,
):
    """Per-correspondence squared reprojection distances.

    Returns (loss0 ``(M,)``, loss1 ``(M,)``, chirality ``(M,)`` float mask).
    ``loss0`` is the distance in image 0 (point from ray pair projected into
    camera 0 vs ``kps0``); ``loss1`` likewise in image 1.

    ``distortion_k`` (with static ``image_wh = (W, H)``) enables the
    distortion-aware variant the reference sketched but left commented out
    (``ray_dist_loss.py:188-199``): with a radial-distortion camera, rays
    are generated from WARPED pixel coordinates, so the pinhole projection
    of the triangulated point lands in warped space while the detected
    keypoints live in raw pixel space. The inverse-distortion lookup maps
    the projections back to raw pixels before the comparison; projections
    outside the invertible range fail the chirality-style validity mask.
    The lookup's interpolation is differentiable in both the projection and
    ``k`` — this is what makes k observable through the PRD loss (measured
    unobservable without it).
    """
    if method == "NeRF":
        K = K.at[0, 0].set(-K[0, 0])
    ext_inv = se3_inverse(extrinsics_pair)  # (2, 4, 4)

    o0, d0 = rays0
    o1, d1 = rays1
    d0 = d0 / (jnp.linalg.norm(d0, axis=-1, keepdims=True) + _EPS)
    d1 = d1 / (jnp.linalg.norm(d1, axis=-1, keepdims=True) + _EPS)

    r01 = jnp.sum(d0 * d1, axis=-1)
    o_diff = o0 - o1
    # Identical to the reference's r01^2 - 1 + eps denominator
    # (ray_dist_loss.py:143,156) for every pair whose rays subtend more than
    # ~0.57 deg (1 - r01^2 > 1e-4); pairs below that are geometrically
    # untriangulable — the reference lets their t explode and filters them by
    # the loss threshold, but the exploded intermediate carries ~1e18-scale
    # partial derivatives that overflow XLA's fused backward into NaN
    # (measured: eager fine, jit NaN). Flooring the denominator bounds every
    # partial while leaving non-degenerate numerics bit-identical.
    denom = jnp.minimum(r01**2 - 1.0 + _EPS, -1e-4)
    t0 = (jnp.sum(d0 * o_diff, -1) - r01 * jnp.sum(d1 * o_diff, -1)) / denom
    t1 = (jnp.sum(d1 * -o_diff, -1) - r01 * jnp.sum(d0 * -o_diff, -1)) / denom
    # Degenerate (near-parallel) ray pairs drive |t| -> 1/eps; the squared
    # reprojection error then overflows f32, and worse, near-vanishing-point
    # projections of such points can pass the loss filter with ~1e17-scale
    # partial derivatives that overflow under XLA's fused backward (measured:
    # eager grads finite, combined-jit grads NaN). The reference drops
    # degenerate entries by boolean indexing, removing them from autodiff;
    # here we clamp the ray parameter to a generous scene-scale bound —
    # clipped entries keep their (garbage, filtered) value but get zero
    # t-gradient, matching the reference's drop semantics and keeping every
    # partial comfortably inside f32 under any fusion order.
    _T_MAX = 1e4
    t0 = jnp.clip(t0, -_T_MAX, _T_MAX)
    t1 = jnp.clip(t1, -_T_MAX, _T_MAX)

    p0 = o0 + t0[..., None] * d0
    p1 = o1 + t1[..., None] * d1

    def project(p, w2c):
        p4 = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        cam = jnp.matmul(p4, w2c.T, precision="highest")
        pix = jnp.matmul(cam, K.T, precision="highest")
        # The reference divides by z + eps (ray_dist_loss.py:173-176), but
        # z + 1e-10 rounds to EXACTLY zero for z ~ -1e-10, making the local
        # partial inf; 0 * inf then leaks NaN through the masked-out entries'
        # vjp even though their cotangent is zero. Use a sign-preserving
        # floor instead: identical values for every non-degenerate point
        # (|z| >= 1e-6 in pixels means anything remotely in front of or
        # behind the camera), bounded partials everywhere.
        z = pix[..., 2:3]
        z_floor = jnp.where(z < 0, -1e-6, 1e-6)
        z_safe = jnp.where(jnp.abs(z) < 1e-6, z_floor, z)
        return pix[..., :2] / z_safe

    p0_in_im1 = project(p0, ext_inv[1])
    p1_in_im0 = project(p1, ext_inv[0])

    chirality = jnp.logical_and(t0 > 0, t1 > 0).astype(jnp.float32)
    if distortion_k is not None:
        from scnerf_tpu.camera.distortion import undistort_pixels

        assert image_wh is not None, "distortion-aware PRD needs image_wh=(W, H)"
        W, H = image_wh
        v0, p1_in_im0 = undistort_pixels(
            W, H, distortion_k, p1_in_im0[..., 0], p1_in_im0[..., 1]
        )
        v1, p0_in_im1 = undistort_pixels(
            W, H, distortion_k, p0_in_im1[..., 0], p0_in_im1[..., 1]
        )
        chirality = chirality * v0.astype(jnp.float32) * v1.astype(jnp.float32)
    # Second overflow guard: the projection itself can reach ~1e12 px for
    # surviving near-degenerate points; cap the squared error well above any
    # real threshold so downstream masking keeps finite gradients.
    _L_MAX = 1e8
    loss0 = jnp.minimum(jnp.sum((p1_in_im0 - kps0) ** 2, axis=-1), _L_MAX)
    loss1 = jnp.minimum(jnp.sum((p0_in_im1 - kps1) ** 2, axis=-1), _L_MAX)
    return loss0, loss1, chirality


def prd_loss(
    kps0: jnp.ndarray,
    kps1: jnp.ndarray,
    rays0: tuple,
    rays1: tuple,
    K: jnp.ndarray,
    extrinsics_pair: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    threshold: float = 5.0,
    method: str = "NeRF",
    mode: str = "train",
    distortion_k: jnp.ndarray | None = None,
    image_wh: tuple | None = None,
):
    """PRD for one image pair over a padded batch of correspondences.

    Args:
      kps0, kps1: ``(M, 2)`` matched keypoints in images 0 / 1.
      rays0, rays1: (origins ``(M, 3)``, directions ``(M, 3)``) through the
        keypoints (generated by the camera under calibration).
      K: ``(4, 4)`` current intrinsics.
      extrinsics_pair: ``(2, 4, 4)`` current c2w extrinsics of the two images.
      mask: ``(M,)`` validity of each (padded) correspondence; None = all.
      threshold: squared-pixel-distance outlier threshold
        (``proj_ray_dist_threshold``, default 5.0).
      method: "NeRF" negates fx to bridge the OpenGL-style axes
        (``ray_dist_loss.py:101-103``); "NeRF++" leaves K as-is.
      mode: "train" drops outliers from the mean; "val"/"test" clamps them to
        ``threshold`` (``ray_dist_loss.py:210-246``).
    Returns:
      (loss scalar, num_valid_matches scalar) — ``num_valid`` mirrors the
      reference's joint-validity count (train) and is the mask count in eval.
    """
    if mask is None:
        mask = jnp.ones(kps0.shape[0], dtype=bool)
    mask = mask.astype(jnp.float32)

    loss0, loss1, chirality = prd_pointwise(
        kps0, kps1, rays0, rays1, K, extrinsics_pair, method=method,
        distortion_k=distortion_k, image_wh=image_wh,
    )
    valid_base = mask * chirality

    if mode == "train":
        v0 = valid_base * (loss0 < threshold) * jnp.isfinite(loss0)
        v1 = valid_base * (loss1 < threshold) * jnp.isfinite(loss1)
        l0 = jnp.sum(jnp.where(v0 > 0, loss0, 0.0)) / jnp.maximum(jnp.sum(v0), 1.0)
        l1 = jnp.sum(jnp.where(v1 > 0, loss1, 0.0)) / jnp.maximum(jnp.sum(v1), 1.0)
        num = jnp.sum(v0 * v1)
        return 0.5 * (l0 + l1), num
    else:
        loss0 = jnp.where(
            jnp.logical_and(loss0 <= threshold, jnp.isfinite(loss0)), loss0, threshold
        )
        loss1 = jnp.where(
            jnp.logical_and(loss1 <= threshold, jnp.isfinite(loss1)), loss1, threshold
        )
        # The reference gathers chirality-valid matches before the eval mean
        # (ray_dist_loss.py:178-186); padded entries are likewise excluded.
        count = jnp.maximum(jnp.sum(valid_base), 1.0)
        l0 = jnp.sum(loss0 * valid_base) / count
        l1 = jnp.sum(loss1 * valid_base) / count
        return 0.5 * (l0 + l1), jnp.sum(valid_base)
