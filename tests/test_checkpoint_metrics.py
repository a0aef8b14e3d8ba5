"""Checkpoint round-trip / resume tests + SSIM golden checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scnerf_tpu.metrics.ssim import ssim
from scnerf_tpu.train.checkpoint import (
    list_checkpoint_steps,
    merge_states,
    restore_camera_partial,
    restore_checkpoint,
    save_checkpoint,
)


class TestSSIM:
    def test_identical_images(self):
        img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_noise_lowers_ssim(self):
        img = jax.random.uniform(jax.random.key(1), (32, 32, 3))
        noisy = jnp.clip(img + jax.random.normal(jax.random.key(2), img.shape) * 0.2, 0, 1)
        v = float(ssim(img, noisy))
        assert 0.0 < v < 0.95

    def test_near_identical_bounded_by_one(self):
        """Regression: on a converged render vs its target (smooth blobs on
        a flat black background) the E[x^2]-mu^2 cancellation under the
        TPU's default bf16 conv accumulation produced negative variances
        and per-window blowups ("SSIM" 14.7 on a 32 dB image). The metric
        now forces HIGHEST conv precision and clamps variances, so the
        result must stay in [-1, 1] and sit at ~1 for near-identical
        inputs — on every backend."""
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
        img = np.zeros((48, 64, 3), np.float32)
        for cx, cy, ch in ((16, 20, 0), (40, 30, 1), (30, 12, 2)):
            img[..., ch] += 0.8 * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / 40.0
            )
        img = np.clip(img, 0.0, 1.0)
        noisy = np.clip(
            img + np.random.RandomState(0).randn(*img.shape).astype(np.float32)
            * 3e-3, 0.0, 1.0)
        v = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
        assert -1.0 <= v <= 1.0 + 1e-5, v
        assert v > 0.98, v

    def test_constant_shift(self):
        img = jnp.full((24, 24, 3), 0.5)
        shifted = jnp.full((24, 24, 3), 0.6)
        v = float(ssim(img, shifted))
        # luminance term only: (2*0.5*0.6 + 1e-4) / (0.25 + 0.36 + 1e-4)
        expect = (2 * 0.5 * 0.6 + 1e-4) / (0.25 + 0.36 + 1e-4)
        np.testing.assert_allclose(v, expect, atol=1e-4)


class TestCheckpoint:
    def _make(self):
        from tests.test_train import build

        return build()

    @pytest.mark.slow
    def test_roundtrip_and_resume(self, tmp_path):
        state, step, batch = self._make()
        key = jax.random.key(0)
        for i in range(3):
            state, _ = step(state, batch, jax.random.fold_in(key, i))
        path = save_checkpoint(str(tmp_path), state)
        assert list_checkpoint_steps(str(tmp_path)) == [3]

        restored = restore_checkpoint(str(tmp_path), state)
        assert int(restored.step) == 3
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Training continues identically from the restored state.
        s1, m1 = step(state, batch, jax.random.fold_in(key, 99))
        s2, m2 = step(restored, batch, jax.random.fold_in(key, 99))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    @pytest.mark.slow
    def test_keep_prunes_old(self, tmp_path):
        state, step, batch = self._make()
        key = jax.random.key(1)
        for i in range(4):
            state, _ = step(state, batch, jax.random.fold_in(key, i))
            save_checkpoint(str(tmp_path), state, keep=2)
        assert list_checkpoint_steps(str(tmp_path)) == [3, 4]

    def test_restore_none_when_empty(self, tmp_path):
        state, _, _ = self._make()
        assert restore_checkpoint(str(tmp_path / "nope"), state) is None

    @pytest.mark.slow
    def test_optim_meta_validated_on_restore(self, tmp_path):
        """Optimizer-structure knobs are persisted with the checkpoint and
        a mismatched resume fails loudly (the knobs change the optax chain
        structure — train/optim.py; replaying them wrong used to corrupt
        the opt-state restore silently)."""
        state, step, batch = self._make()
        state, _ = step(state, batch, jax.random.key(0))
        meta = {"camera_lrate_mult": 8.0, "camera_lrate_mult_until": 5000,
                "distortion_lrate_mult": 1.0,
                "distortion_lrate_mult_until": 0}
        save_checkpoint(str(tmp_path), state, optim_meta=meta)
        # matching knobs restore fine
        r = restore_checkpoint(str(tmp_path), state, optim_meta=dict(meta))
        assert int(r.step) == int(state.step)
        # no knobs passed -> unvalidated restore still works (old callers)
        assert restore_checkpoint(str(tmp_path), state) is not None
        # mismatched knobs raise
        with pytest.raises(ValueError, match="optimizer knobs"):
            restore_checkpoint(str(tmp_path), state,
                               optim_meta=dict(meta, camera_lrate_mult=1.0))

    def test_merge_states_shape_guard(self):
        state, _, _ = self._make()
        other = jax.tree.map(lambda x: x + 1.0, state)
        merged = merge_states(state, other)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(merged.params)[0]),
            np.asarray(jax.tree.leaves(other.params)[0]),
        )

    def test_partial_camera_restore(self):
        state, _, _ = self._make()
        cam = state.params["camera"]
        trained = cam.replace(
            intrinsics_noise=jnp.ones(4),
            extrinsics_noise=jnp.ones_like(cam.extrinsics_noise),
        )
        merged = restore_camera_partial(cam, trained, skip_extrinsics=True)
        np.testing.assert_array_equal(np.asarray(merged.intrinsics_noise), np.ones(4))
        np.testing.assert_array_equal(
            np.asarray(merged.extrinsics_noise), np.zeros_like(cam.extrinsics_noise)
        )
