"""Sim(3) trajectory alignment (Umeyama / ATE-style).

Replaces the reference's dependency on the ``thirdparty/ATE`` submodule
(``align_ate_c2b_use_a2b``, used at ``/root/reference/NeRF/run_nerf.py:646-660``
to transport GT val/test poses into the learned-camera frame before rendering).
Implemented from the Umeyama (1991) closed form — no external code.
"""
from __future__ import annotations

import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning ``src`` points to ``dst``.

    Finds ``s, R, t`` minimizing ``|| dst - (s * R @ src + t) ||^2``.

    Args:
      src, dst: ``(N, 3)``.
    Returns:
      (s: scalar, R: ``(3, 3)``, t: ``(3,)``).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    n = src.shape[0]
    cov = (xd.T @ xs) / n
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.sum(xs * xs) / n
    s = jnp.where(with_scale, jnp.trace(jnp.diag(D) @ S) / var_s, 1.0)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def align_c2w_trajectories(poses_a: jnp.ndarray, poses_b: jnp.ndarray):
    """Sim(3) aligning camera-to-world trajectory ``a`` onto ``b``.

    The rebuild's equivalent of ATE's ``align_ate_c2b_use_a2b``: estimate the
    similarity from camera centers, then apply it to full 4x4 c2w poses.

    Args:
      poses_a, poses_b: ``(N, 4, 4)`` c2w.
    Returns:
      (aligned_a ``(N, 4, 4)``, (s, R, t)).
    """
    centers_a = poses_a[:, :3, 3]
    centers_b = poses_b[:, :3, 3]
    s, R, t = umeyama(centers_a, centers_b)
    aligned = apply_sim3(poses_a, s, R, t)
    return aligned, (s, R, t)


def apply_sim3(poses: jnp.ndarray, s, R, t) -> jnp.ndarray:
    """Apply a Sim(3) to c2w poses: rotation composes, translation maps."""
    Rs = poses[:, :3, :3]
    ts = poses[:, :3, 3]
    new_R = jnp.einsum("ij,njk->nik", R, Rs)
    new_t = s * jnp.einsum("ij,nj->ni", R, ts) + t
    out = poses.at[:, :3, :3].set(new_R)
    out = out.at[:, :3, 3].set(new_t)
    return out


def ate_rmse(poses_a: jnp.ndarray, poses_b: jnp.ndarray) -> jnp.ndarray:
    """Absolute trajectory error (RMSE of centers) after Sim(3) alignment."""
    aligned, _ = align_c2w_trajectories(poses_a, poses_b)
    err = aligned[:, :3, 3] - poses_b[:, :3, 3]
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))
