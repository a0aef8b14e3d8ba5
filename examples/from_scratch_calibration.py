"""From-scratch self-calibration (the paper's Table-1 regime, BASELINE.json
config: no COLMAP initialization).

Forward-facing rig — the regime where the reference's run_without_colmap
mode operates (recentered LLFF poses are all near identity, so identity
init is a small perturbation; a 360-degree rig is NOT recoverable this way).

Measured on TPU v5e (12k steps, 11 train views, identity-R/zero-t/wrong-
focal init):

    rotation error:    167.6 deg -> 1.10 deg (Sim(3)-aligned)
    translation error: 0.357    -> 0.10  (rig span ~1.0)
    PRD:               no valid matches -> 256/256 valid at 0.017 px^2
    train PSNR 47.3 dB, held-out (aligned) 25.0 dB

Run: python examples/from_scratch_calibration.py
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from scnerf_tpu.camera import (CameraConfig, OPENGL, init_camera, pixels_to_rays,
                               get_extrinsics, get_intrinsic)
from scnerf_tpu.camera.rays import rays_no_camera, full_image_pixels
from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
from scnerf_tpu.render.renderer import RenderConfig, render_chunked
from scnerf_tpu.render.composite import raw2outputs
from scnerf_tpu.sampling.stratified import stratified_z_vals
from scnerf_tpu.train.curriculum import Curriculum
from scnerf_tpu.train.optim import make_optimizer
from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step
from scnerf_tpu.data.batching import sample_pixels, gather_target
from scnerf_tpu.matching.provider import PrecomputedMatches, PairMatches, pad_matches
from scnerf_tpu.geometry.alignment import align_c2w_trajectories
from scnerf_tpu.geometry.so3 import axis_angle_to_rotation
from scnerf_tpu.losses.photometric import img2mse, mse2psnr

H = W = 100; F = 90.0; N_IMG = 12
rng = np.random.RandomState(0)
# forward-facing cluster: cameras near (0,0,4) looking down -z with tiny tilts
gt_poses = np.broadcast_to(np.eye(4), (N_IMG, 4, 4)).copy()
for i in range(N_IMG):
    ax = rng.randn(3); ax /= np.linalg.norm(ax)
    R = np.asarray(axis_angle_to_rotation(jnp.asarray(ax[None]), jnp.asarray([rng.uniform(-0.06, 0.06)])))[0]
    gt_poses[i, :3, :3] = R
    gt_poses[i, :3, 3] = [rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 4.0 + rng.uniform(-0.3, 0.3)]
K = np.array([[F,0,W/2,0],[0,F,H/2,0],[0,0,1,0],[0,0,0,1]])

def field(pts):
    c1 = jnp.array([0.5, 0.2, -0.1]); c2 = jnp.array([-0.6, -0.3, 0.3]); c3 = jnp.array([0.0, 0.6, 0.5])
    d1 = jnp.sum((pts-c1)**2, -1); d2 = jnp.sum((pts-c2)**2, -1); d3 = jnp.sum((pts-c3)**2, -1)
    sigma = 40*jnp.exp(-d1/0.08) + 35*jnp.exp(-d2/0.1) + 30*jnp.exp(-d3/0.05)
    rgb = (jnp.exp(-d1/0.08)[...,None]*jnp.array([4.,-4,-4]) +
           jnp.exp(-d2/0.1)[...,None]*jnp.array([-4.,4,-4]) +
           jnp.exp(-d3/0.05)[...,None]*jnp.array([-4.,-4,4.]))
    return jnp.concatenate([rgb, sigma[...,None]], -1)

@jax.jit
def render_gt(c2w):
    px, py = full_image_pixels(H, W)
    o, d = rays_no_camera(H, W, F, c2w, px, py)
    z = stratified_z_vals(None, jnp.full((H*W,),2.0), jnp.full((H*W,),6.5), 128, perturb=False)
    pts = o[:,None,:] + d[:,None,:]*z[...,None]
    return raw2outputs(field(pts), z, d)["rgb"].reshape(H, W, 3)

images = np.stack([np.asarray(render_gt(jnp.asarray(p))) for p in gt_poses])
i_test = np.array([0]); i_train = np.array([i for i in range(N_IMG) if i != 0])

# perfect correspondences between train views (camera-table indices)
pts3d = rng.randn(500, 3) * 0.5
cache = PrecomputedMatches(); pair_list = []
def project(E_i, pts):
    cam = (pts - E_i[:3,3]) @ E_i[:3,:3]
    zc = -cam[:,2]
    u = W/2 + F*cam[:,0]/zc; v = H/2 - F*cam[:,1]/zc
    ok = (zc > 0.5) & (u >= 0) & (u < W-1) & (v >= 0) & (v < H-1)
    return np.stack([u, v], -1), ok
for a_ in range(len(i_train)):
    for b_ in range(a_+1, len(i_train)):
        pa, oka = project(gt_poses[i_train[a_]], pts3d)
        pb, okb = project(gt_poses[i_train[b_]], pts3d)
        ok = oka & okb
        if ok.sum() >= 32:
            cache.put(a_, b_, PairMatches(pa[ok].astype(np.float32), pb[ok].astype(np.float32)))
            pair_list.append((a_, b_))
print("pairs:", len(pair_list))

# from-scratch init: identity R, zero t, focal=W (reference run_without_colmap)
scratch = np.broadcast_to(np.eye(4), (len(i_train), 4, 4)).copy()
K0 = np.array([[W,0,W/2,0],[0,H,H/2,0],[0,0,1,0],[0,0,0,1]], np.float64)
ccfg = CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                    intrinsics_noise_scale=1.0, extrinsics_noise_scale=1.0)
cam = init_camera(K0, scratch, ccfg)
mcfg = NeRFConfig(depth=4, width=64, skips=(2,), multires=6, multires_views=2)
rcfg = RenderConfig(n_samples=48, n_importance=48)
tcfg = TrainConfig(lr_init=1e-3, lr_decay_steps=200e3, near=0.5, far=8.0, prd_method="NeRF")
cur = Curriculum(add_ie=0, add_od=1000000, add_prd=0, i_ray_dist_loss=1, ray_dist_loss_weight=0.05)
key = jax.random.key(1)
params = {"coarse": init_nerf_mlp(key, mcfg), "fine": init_nerf_mlp(jax.random.fold_in(key,1), mcfg), "camera": cam}
tx = make_optimizer(1e-3, 200e3, params_example=params)
state = create_train_state(params, tx)
step = make_train_step(mcfg, rcfg, tcfg, cur, tx, donate=False)
step_prd = make_train_step(mcfg, rcfg, tcfg, cur, tx, with_prd=True, donate=False)

def aligned_err(camera):
    E = np.asarray(get_extrinsics(camera))
    aligned, _ = align_c2w_trajectories(jnp.asarray(E), jnp.asarray(gt_poses[i_train]))
    aligned = np.asarray(aligned)
    rot = [np.degrees(np.arccos(np.clip((np.trace(aligned[i][:3,:3].T @ gt_poses[i_train[i]][:3,:3])-1)/2, -1, 1)))
           for i in range(len(i_train))]
    t = np.linalg.norm(aligned[:, :3, 3] - gt_poses[i_train][:, :3, 3], axis=1)
    return np.mean(rot), np.mean(t)

nprng = np.random.RandomState(2)
for it in range(12000):
    ci = nprng.randint(0, len(i_train)); img_i = i_train[ci]
    px, py = sample_pixels(nprng, H, W, 1024)
    batch = {"px": jnp.asarray(px), "py": jnp.asarray(py),
             "img_idx": jnp.full((1024,), ci, jnp.int32),
             "target": jnp.asarray(gather_target(images, img_i, px, py))}
    a_, b_ = pair_list[nprng.randint(len(pair_list))]
    kps0, kps1, mask = pad_matches(cache.get(a_, b_), 256)
    batch.update(kps0=jnp.asarray(kps0), kps1=jnp.asarray(kps1),
                 kp_mask=jnp.asarray(mask), pair_idx=jnp.asarray([a_, b_]))
    state, m = step_prd(state, batch, jax.random.fold_in(key, it))
    if it % 2000 == 0:
        r, t = aligned_err(state.params["camera"])
        print("it %5d loss=%.4f psnr=%.1f prd=%.3f n=%3d | rot=%.3f t=%.4f" % (
            it, float(m["loss"]), float(m["psnr"]), float(m.get("prd",-1)),
            int(m.get("prd_matches",-1)), r, t))
r1, t1 = aligned_err(state.params["camera"])
# held-out PSNR with aligned pose
from scnerf_tpu.geometry.alignment import apply_sim3
E = np.asarray(get_extrinsics(state.params["camera"]))
_, (s3, R3, t3) = align_c2w_trajectories(jnp.asarray(gt_poses[i_train]), jnp.asarray(E))
c2w = apply_sim3(jnp.asarray(gt_poses[i_test[0]:i_test[0]+1]), s3, R3, t3)[0]
px, py = full_image_pixels(H, W)
o, d = pixels_to_rays(state.params["camera"], px, py, c2w=c2w)
vd = d / (jnp.linalg.norm(d, axis=-1, keepdims=True)+1e-10)
out = render_chunked(state.params, mcfg, rcfg.eval_mode(), o, d, vd, 0.5, 8.0, jax.random.key(9))
mse = img2mse(jnp.minimum(out["rgb"],1.0), jnp.asarray(images[i_test[0]].reshape(-1,3)))
print("final: rot=%.3f deg t=%.4f | held-out PSNR=%.2f dB" % (r1, t1, float(mse2psnr(mse))))
