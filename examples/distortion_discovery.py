"""Radial-distortion discovery from zero init via distortion-aware PRD.

Capability BEYOND the reference: its PRD never corrects for the
warped-vs-raw pixel-space mismatch of a distortion camera (the fix is
sketched but commented out, ``ray_dist_loss.py:188-199``), so the radial
coefficients are unobservable through PRD — fisheye runs must start from
COLMAP's k estimate. With ``losses/prd.py``'s distortion-aware variant the
projections are mapped through the differentiable inverse-distortion
lookup, making k learnable from correspondences alone.

This demo builds a synthetic multi-view rig whose "SIFT" correspondences
come from a ground-truth camera with k = (0.08, -0.03), initialises the
learnable camera at k = 0, and optimises ONLY the distortion noise by
Adam on the distortion-aware PRD. Measured (TPU v5e, converges by ~300
steps, <1 min):

    k error: |k - k_gt| = 0.080 -> 0.002
    PRD:     1.60 px^2 -> 0.06 px^2 (residual = half-pixel convention +
             lookup-lerp quantisation)

Run: python examples/distortion_discovery.py
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera, pixels_to_rays
from scnerf_tpu.camera.distortion import undistort_pixels
from scnerf_tpu.camera.model import get_distortion, get_extrinsic, get_intrinsic
from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
from scnerf_tpu.losses.prd import prd_loss

K_GT = np.array([0.08, -0.03], np.float32)
H, W = 480, 640
N_VIEWS = 4
N_PTS = 256


def build_rig():
    rng = np.random.RandomState(0)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 520.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    ax = rng.randn(N_VIEWS, 3)
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    E = np.array(embed_rotation_44(axis_angle_to_rotation(
        jnp.asarray(ax), jnp.asarray(rng.rand(N_VIEWS) * 0.12))))
    E[:, :3, 3] = rng.randn(N_VIEWS, 3) * 0.25
    pts = rng.randn(N_PTS, 3) * np.array([1.2, 0.9, 0.4]) + np.array([0, 0, 5.0])

    def observe(E_i):
        """Raw-pixel keypoints of pts as seen by the DISTORTED GT camera."""
        cam_pts = (pts - E_i[:3, 3]) @ E_i[:3, :3]
        pix = cam_pts @ K[:3, :3].T
        warped = pix[:, :2] / pix[:, 2:3]
        valid, xy = undistort_pixels(W, H, jnp.asarray(K_GT),
                                     jnp.asarray(warped[:, 0]),
                                     jnp.asarray(warped[:, 1]))
        return np.asarray(valid), np.asarray(xy, np.float32)

    obs = [observe(E[i]) for i in range(N_VIEWS)]
    pairs = []
    for i in range(N_VIEWS):
        for j in range(i + 1, N_VIEWS):
            keep = obs[i][0] & obs[j][0]
            if keep.sum() >= 64:
                pairs.append((i, j, obs[i][1][keep][:128], obs[j][1][keep][:128]))
    return K, E, pairs


def main():
    K, E, pairs = build_rig()
    print(f"rig: {N_VIEWS} views, {len(pairs)} correspondence pairs, "
          f"k_gt={K_GT.tolist()}")
    cam = init_camera(
        K, E,
        CameraConfig(H=H, W=W, convention=OPENCV, pixel_offset=0.5,
                     use_distortion=True, distortion_noise_scale=1e-2),
        k=np.zeros(2, np.float32),  # zero-init: k is DISCOVERED
    )

    import optax

    tx = optax.adam(3e-1)  # noise is scaled by 1e-2 -> effective k lr 3e-3
    opt_state = tx.init(cam.distortion_noise)

    def total_prd(noise):
        c = cam.replace(distortion_noise=noise)
        loss = 0.0
        for (i, j, kps0, kps1) in pairs:
            r0 = pixels_to_rays(c, kps0[:, 0] - 0.5, kps0[:, 1] - 0.5,
                                image_idx=i, add_noise=False)
            r1 = pixels_to_rays(c, kps1[:, 0] - 0.5, kps1[:, 1] - 0.5,
                                image_idx=j, add_noise=False)
            l, _ = prd_loss(
                jnp.asarray(kps0), jnp.asarray(kps1), r0, r1,
                get_intrinsic(c), get_extrinsic(c, jnp.array([i, j])),
                method="NeRF++", mode="val", threshold=100.0,
                distortion_k=get_distortion(c), image_wh=(W, H),
            )
            loss = loss + l
        return loss / len(pairs)

    @jax.jit
    def step(noise, opt_state):
        loss, g = jax.value_and_grad(total_prd)(noise)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(noise, updates), opt_state, loss

    noise = cam.distortion_noise
    k0 = np.asarray(get_distortion(cam.replace(distortion_noise=noise)))
    print(f"init:  k={k0.tolist()}  |k-k_gt|={np.abs(k0 - K_GT).max():.4f}  "
          f"prd={float(total_prd(noise)):.4f}")
    for it in range(1500):
        noise, opt_state, loss = step(noise, opt_state)
        if (it + 1) % 300 == 0:
            k_now = np.asarray(get_distortion(cam.replace(distortion_noise=noise)))
            print(f"step {it + 1:5d}: prd={float(loss):.5f}  "
                  f"k={np.round(k_now, 4).tolist()}  "
                  f"|k-k_gt|={np.abs(k_now - K_GT).max():.4f}")
    k_final = np.asarray(get_distortion(cam.replace(distortion_noise=noise)))
    err = np.abs(k_final - K_GT).max()
    print(f"final: k={k_final.tolist()} vs k_gt={K_GT.tolist()} -> "
          f"max err {err:.4f} ({'OK' if err < 0.005 else 'NOT CONVERGED'})")
    return err


if __name__ == "__main__":
    main()
