"""End-to-end training tests: the 'minimum slice' of SURVEY.md section 7 —
loader -> rays -> stratified -> MLP -> composite -> inverse-CDF -> loss ->
optax -> psnr — plus curriculum and optimizer-mask behavior."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scnerf_tpu.camera import CameraConfig, OPENGL, get_intrinsic, init_camera
from scnerf_tpu.fields.nerf import NeRFConfig, init_nerf_mlp
from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
from scnerf_tpu.render.renderer import RenderConfig
from scnerf_tpu.train.curriculum import Curriculum
from scnerf_tpu.train.optim import make_optimizer, noise_decay_mask, frozen_mask
from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step


def synthetic_scene(H=16, W=16, n_images=2):
    """A fixed-camera synthetic target: rays through a 'sphere' density give a
    smooth deterministic image we can overfit."""
    cfg = CameraConfig(H=H, W=W, grid_size=4, convention=OPENGL)
    K = np.array([[12.0, 0, W / 2, 0], [0, 12.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    E = np.broadcast_to(np.eye(4), (n_images, 4, 4)).copy()
    E[:, 2, 3] = 4.0  # camera at z=4 looking down -z (OpenGL)
    E[1, 0, 3] = 0.5
    cam = init_camera(K, E, cfg)
    py, px = np.mgrid[0:H, 0:W]
    # Smooth target image.
    target = np.stack(
        [
            0.5 + 0.5 * np.sin(px / W * np.pi),
            0.5 + 0.5 * np.cos(py / H * np.pi),
            np.full_like(px, 0.25, dtype=np.float64),
        ],
        axis=-1,
    ).reshape(-1, 3)
    return cam, px.reshape(-1).astype(np.float32), py.reshape(-1).astype(np.float32), target


def build(step_kwargs=None, opt_kwargs=None, cur=None, with_camera=True):
    model_cfg = NeRFConfig(depth=3, width=32, skips=(1,), multires=4, multires_views=2)
    render_cfg = RenderConfig(n_samples=8, n_importance=8, perturb=True)
    kw = dict(lr_init=5e-3, lr_decay_steps=1e6, near=2.0, far=6.0)
    kw.update(step_kwargs or {})
    train_cfg = TrainConfig(**kw)
    cur = cur or Curriculum()
    cam, px, py, target = synthetic_scene()
    key = jax.random.key(0)
    params = {
        "coarse": init_nerf_mlp(key, model_cfg),
        "fine": init_nerf_mlp(jax.random.fold_in(key, 1), model_cfg),
    }
    if with_camera:
        params["camera"] = cam
    tx = make_optimizer(train_cfg.lr_init, train_cfg.lr_decay_steps,
                        params_example=params, **(opt_kwargs or {}))
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, cur, tx, donate=False)
    batch = {
        "px": jnp.asarray(px),
        "py": jnp.asarray(py),
        "img_idx": jnp.zeros(px.shape[0], jnp.int32),
        "target": jnp.asarray(target, jnp.float32),
    }
    return state, step, batch


class TestEndToEnd:
    @pytest.mark.slow
    def test_loss_decreases_overfit(self):
        state, step, batch = build()
        key = jax.random.key(7)
        first = None
        for i in range(60):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)
        assert float(metrics["psnr"]) > 10.0

    def test_frozen_initials_never_move(self):
        state, step, batch = build()
        init0 = np.array(state.params["camera"].intrinsics_init)
        ext0 = np.array(state.params["camera"].extrinsics_init)
        key = jax.random.key(8)
        for i in range(3):
            state, _ = step(state, batch, jax.random.fold_in(key, i))
        np.testing.assert_array_equal(np.array(state.params["camera"].intrinsics_init), init0)
        np.testing.assert_array_equal(np.array(state.params["camera"].extrinsics_init), ext0)

    @pytest.mark.slow
    def test_curriculum_gates_camera_updates(self):
        cur = Curriculum(add_ie=2, add_od=1000)
        state, step, batch = build(cur=cur)
        key = jax.random.key(9)
        # Steps 0,1: ie locked -> no noise movement.
        for i in range(2):
            state, _ = step(state, batch, jax.random.fold_in(key, i))
        cam = state.params["camera"]
        np.testing.assert_array_equal(np.array(cam.intrinsics_noise), np.zeros(4))
        np.testing.assert_array_equal(np.array(cam.ray_o_grid), np.zeros_like(cam.ray_o_grid))
        # Step 2: ie unlocks, od still locked.
        state, _ = step(state, batch, jax.random.fold_in(key, 2))
        cam = state.params["camera"]
        assert float(jnp.abs(cam.intrinsics_noise).sum()) > 0
        np.testing.assert_array_equal(np.array(cam.ray_o_grid), np.zeros_like(cam.ray_o_grid))

    def test_camera_lr_mult_scales_only_calibration_leaves(self):
        """camera_lr_mult must scale the post-Adam update on the camera's
        intrinsics/extrinsics/distortion noise (and nothing else). With a
        constant gradient, Adam's first update is ~lr*sign(g), so the mult-4
        update must be 4x the mult-1 update on those leaves and identical on
        the MLP and the per-ray grids."""
        state, _, _ = build()
        params = state.params
        grads = jax.tree.map(jnp.ones_like, params)

        def first_update(mult):
            tx = make_optimizer(1e-3, 1e9, params_example=params,
                                camera_lr_mult=mult)
            opt_state = tx.init(params)
            upd, _ = tx.update(grads, opt_state, params)
            return upd

        u1, u4 = first_update(1.0), first_update(4.0)
        np.testing.assert_allclose(
            np.array(u4["camera"].intrinsics_noise),
            4.0 * np.array(u1["camera"].intrinsics_noise), rtol=1e-6)
        np.testing.assert_allclose(
            np.array(u4["camera"].extrinsics_noise),
            4.0 * np.array(u1["camera"].extrinsics_noise), rtol=1e-6)
        np.testing.assert_array_equal(
            np.array(u4["camera"].ray_o_grid), np.array(u1["camera"].ray_o_grid))
        for a, b in zip(jax.tree.leaves(u1["coarse"]), jax.tree.leaves(u4["coarse"])):
            np.testing.assert_array_equal(np.array(a), np.array(b))
        # frozen initials still pinned at zero update
        np.testing.assert_array_equal(
            np.array(u4["camera"].intrinsics_init),
            np.zeros_like(np.array(u4["camera"].intrinsics_init)))

    def test_camera_lr_mult_until_anneals_to_shared_lr(self):
        """With camera_lr_mult_until=N the multiplier applies for the first
        N steps and is exactly 1.0 after (measured necessity: a held mult
        drifts post-convergence, docs/calibration_convergence.md r4c)."""
        state, _, _ = build()
        params = state.params
        grads = jax.tree.map(jnp.ones_like, params)
        tx_ann = make_optimizer(1e-3, 1e9, params_example=params,
                                camera_lr_mult=4.0, camera_lr_mult_until=2)
        tx_ref = make_optimizer(1e-3, 1e9, params_example=params)
        os_a, os_r = tx_ann.init(params), tx_ref.init(params)
        for i in range(4):
            ua, os_a = tx_ann.update(grads, os_a, params)
            ur, os_r = tx_ref.update(grads, os_r, params)
            ia = np.array(ua["camera"].intrinsics_noise)
            ir = np.array(ur["camera"].intrinsics_noise)
            if i < 2:
                np.testing.assert_allclose(ia, 4.0 * ir, rtol=1e-6)
            else:
                np.testing.assert_allclose(ia, ir, rtol=1e-6)
            # MLP updates identical at every step
            np.testing.assert_array_equal(
                np.array(jax.tree.leaves(ua["coarse"])[0]),
                np.array(jax.tree.leaves(ur["coarse"])[0]))

    def test_camera_lr_mult_hold_damps_after_anneal(self):
        """camera_lr_mult_hold < 1 sets the POST-anneal multiplier (the
        identifiability-floor hold phase): mult for the first N steps,
        hold after — and a bare hold (mult=1) still builds the masked
        transform so hold-only configs work."""
        state, _, _ = build()
        params = state.params
        grads = jax.tree.map(jnp.ones_like, params)
        tx_h = make_optimizer(1e-3, 1e9, params_example=params,
                              camera_lr_mult=4.0, camera_lr_mult_until=2,
                              camera_lr_mult_hold=0.25)
        tx_ref = make_optimizer(1e-3, 1e9, params_example=params)
        os_h, os_r = tx_h.init(params), tx_ref.init(params)
        for i in range(4):
            uh, os_h = tx_h.update(grads, os_h, params)
            ur, os_r = tx_ref.update(grads, os_r, params)
            ih = np.array(uh["camera"].intrinsics_noise)
            ir = np.array(ur["camera"].intrinsics_noise)
            expect = 4.0 if i < 2 else 0.25
            np.testing.assert_allclose(ih, expect * ir, rtol=1e-6)
            np.testing.assert_array_equal(
                np.array(jax.tree.leaves(uh["coarse"])[0]),
                np.array(jax.tree.leaves(ur["coarse"])[0]))

    def test_distortion_lr_mult_composes_on_k_only(self):
        """distortion_lr_mult scales ONLY distortion_noise, multiplying on
        top of camera_lr_mult (the from-scratch k-velocity fix: |k1| is 12
        noise-units vs 0.05 for focal, docs/calibration_convergence.md)."""
        state, _, _ = build()
        params = state.params
        grads = jax.tree.map(jnp.ones_like, params)

        def first_update(**kw):
            tx = make_optimizer(1e-3, 1e9, params_example=params, **kw)
            upd, _ = tx.update(grads, tx.init(params), params)
            return upd

        u1 = first_update()
        u = first_update(camera_lr_mult=2.0, distortion_lr_mult=8.0)
        np.testing.assert_allclose(
            np.array(u["camera"].distortion_noise),
            16.0 * np.array(u1["camera"].distortion_noise), rtol=1e-6)
        np.testing.assert_allclose(
            np.array(u["camera"].intrinsics_noise),
            2.0 * np.array(u1["camera"].intrinsics_noise), rtol=1e-6)
        np.testing.assert_array_equal(
            np.array(u["camera"].ray_o_grid), np.array(u1["camera"].ray_o_grid))
        for a, b in zip(jax.tree.leaves(u1["coarse"]), jax.tree.leaves(u["coarse"])):
            np.testing.assert_array_equal(np.array(a), np.array(b))
        # annealed variant returns to the shared LR after the phase
        tx_a = make_optimizer(1e-3, 1e9, params_example=params,
                              distortion_lr_mult=8.0, distortion_lr_mult_until=2)
        tx_r = make_optimizer(1e-3, 1e9, params_example=params)
        os_a, os_r = tx_a.init(params), tx_r.init(params)
        for i in range(4):
            ua, os_a = tx_a.update(grads, os_a, params)
            ur, os_r = tx_r.update(grads, os_r, params)
            da = np.array(ua["camera"].distortion_noise)
            dr = np.array(ur["camera"].distortion_noise)
            np.testing.assert_allclose(da, (8.0 if i < 2 else 1.0) * dr, rtol=1e-6)

    def test_weight_decay_mask_targets_noise_grids(self):
        state, step, batch = build()
        mask = noise_decay_mask(state.params)
        cam_mask = mask["camera"]
        assert cam_mask.ray_o_grid and cam_mask.ray_d_grid and cam_mask.distortion_noise
        assert not cam_mask.intrinsics_noise and not cam_mask.extrinsics_noise
        assert not jax.tree.leaves(mask["coarse"])[0]
        fmask = frozen_mask(state.params)
        assert fmask["camera"].intrinsics_init and not fmask["camera"].ray_o_grid

    @pytest.mark.slow
    def test_no_camera_precomputed_rays(self):
        state, step, _ = build(with_camera=False)
        key = jax.random.key(10)
        rays_o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 4.0])
        rays_d = jnp.concatenate(
            [jax.random.normal(key, (64, 2)) * 0.1, -jnp.ones((64, 1))], axis=-1
        )
        batch = {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "target": jnp.full((64, 3), 0.5),
        }
        for i in range(3):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(metrics["loss"]))


class TestNdcTraining:
    @pytest.mark.slow
    def test_ndc_with_learned_focal_runs(self):
        state, step, batch = build(step_kwargs={"use_ndc": True, "near": 0.0, "far": 1.0})
        key = jax.random.key(11)
        state, metrics = step(state, batch, key)
        assert np.isfinite(float(metrics["loss"]))
        # Gradient reached the intrinsics through the NDC warp.
        state, _ = step(state, batch, jax.random.fold_in(key, 1))
        assert float(jnp.abs(state.params["camera"].intrinsics_noise).sum()) > 0


class TestDeviceSampling:
    def test_batch_contents(self):
        from scnerf_tpu.train.device_sampling import sample_batch_on_device

        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(3, 20, 24, 3).astype(np.float32))
        b = jax.jit(lambda k: sample_batch_on_device(images, k, 64))(jax.random.key(1))
        assert b["px"].shape == (64,) and b["target"].shape == (64, 3)
        # gathered targets match manual indexing
        np.testing.assert_allclose(
            np.asarray(b["target"]),
            np.asarray(images)[np.asarray(b["img_idx"]),
                               np.asarray(b["py"]).astype(int),
                               np.asarray(b["px"]).astype(int)],
        )
        assert int(b["px"].max()) < 24 and int(b["py"].max()) < 20
        # single image per batch
        assert len(np.unique(np.asarray(b["img_idx"]))) == 1

    def test_precrop_bounds(self):
        from scnerf_tpu.train.device_sampling import sample_batch_on_device

        images = jnp.zeros((2, 40, 60, 3))
        b = sample_batch_on_device(images, jax.random.key(2), 256, precrop_frac=0.5)
        assert float(b["px"].min()) >= 15 and float(b["px"].max()) < 45
        assert float(b["py"].min()) >= 10 and float(b["py"].max()) < 30

    @pytest.mark.slow
    def test_multistep_matches_single_step_trajectory(self):
        """steps_per_call=K is a pure dispatch-batching change: the fused
        scan must reproduce the K=1 wrapper's trajectory bit-for-bit (the
        per-step key is fold_in(key, it), same as the host loop)."""
        from scnerf_tpu.train.device_sampling import make_device_sampling_step

        state1, base_step, _ = build()
        state3, _, _ = build()
        cam, px, py, target = synthetic_scene()
        images = jnp.asarray(np.asarray(target).reshape(1, 16, 16, 3))
        step1 = make_device_sampling_step(base_step, images, n_rand=64)
        step3 = make_device_sampling_step(base_step, images, n_rand=64,
                                          steps_per_call=3)
        key = jax.random.key(5)
        for i in range(6):
            state1, m1 = step1(state1, jax.random.fold_in(key, i))
        state3, ms = step3(state3, key, 0)
        state3, ms = step3(state3, key, 3)
        assert ms["loss"].shape == (3,)
        assert float(ms["loss"][-1]) == float(m1["loss"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state1.params, state3.params,
        )
        assert int(state3.step) == 6

    @pytest.mark.slow
    def test_wrapped_step_trains(self):
        from scnerf_tpu.train.device_sampling import make_device_sampling_step

        state, base_step, _ = build()
        cam, px, py, target = synthetic_scene()
        images = jnp.asarray(np.asarray(target).reshape(1, 16, 16, 3))
        step = make_device_sampling_step(base_step, images, n_rand=128)
        key = jax.random.key(3)
        losses = []
        for i in range(20):
            state, m = step(state, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestPrdAnneal:
    """Calibration-phase anneal of the PRD protocol (curriculum.py
    prd_anneal_until): weight and host cadence return to the published
    values once the camera has converged. Mechanism measured in
    docs/artifacts/K_J_annealed_horizon.json (k overshoot past truth under
    a still-hot PRD after the camera-LR anneal)."""

    def test_prd_active_weight_anneals_at_threshold(self):
        from scnerf_tpu.train.curriculum import prd_active

        cur = Curriculum(add_prd=10, ray_dist_loss_weight=3e-4,
                         prd_anneal_until=100,
                         ray_dist_loss_weight_after=1e-4)
        w = jax.jit(prd_active, static_argnums=1)
        assert float(w(jnp.asarray(5), cur)) == 0.0          # pre-add_prd
        assert float(w(jnp.asarray(50), cur)) == pytest.approx(3e-4)
        assert float(w(jnp.asarray(99), cur)) == pytest.approx(3e-4)
        assert float(w(jnp.asarray(100), cur)) == pytest.approx(1e-4)
        assert float(w(jnp.asarray(5000), cur)) == pytest.approx(1e-4)

    def test_prd_active_no_anneal_by_default(self):
        from scnerf_tpu.train.curriculum import prd_active

        cur = Curriculum(add_prd=0, ray_dist_loss_weight=2e-4)
        assert float(prd_active(jnp.asarray(10**9), cur)) == pytest.approx(2e-4)

    def test_prd_cadence_at_switches_host_dispatch(self):
        from scnerf_tpu.train.curriculum import prd_cadence_at

        cur = Curriculum(i_ray_dist_loss=1, prd_anneal_until=100,
                         i_ray_dist_loss_after=10)
        assert prd_cadence_at(0, cur) == 1
        assert prd_cadence_at(99, cur) == 1
        assert prd_cadence_at(100, cur) == 10
        # default: no anneal, cadence constant
        cur0 = Curriculum(i_ray_dist_loss=7)
        assert prd_cadence_at(10**6, cur0) == 7
