"""Sampling tests: searchsorted vs numpy oracle (the reference's own test
strategy, ``NeRF/torchsearchsorted/test/test_searchsorted.py``), stratified
bounds, inverse-CDF statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scnerf_tpu.sampling import perturb_z_vals, sample_pdf, searchsorted, stratified_z_vals


def numpy_searchsorted(a, v, side):
    B = max(a.shape[0], v.shape[0])
    out = np.zeros((B, v.shape[1]), dtype=np.int64)
    for b in range(B):
        out[b] = np.searchsorted(a[b % a.shape[0]], v[b % v.shape[0]], side=side)
    return out


class TestSearchsorted:
    @pytest.mark.parametrize("side", ["left", "right"])
    @pytest.mark.parametrize(
        "Ba,Bv,N,M",
        [(1, 1, 64, 128), (4, 4, 65, 33), (1, 8, 100, 50), (8, 1, 100, 50), (3, 3, 700, 20)],
    )
    def test_vs_numpy_oracle(self, side, Ba, Bv, N, M):
        rng = np.random.RandomState(hash((side, Ba, N)) % 2**31)
        a = np.sort(rng.randn(Ba, N), axis=-1).astype(np.float32)
        v = rng.randn(Bv, M).astype(np.float32)
        got = searchsorted(jnp.asarray(a), jnp.asarray(v), side=side)
        want = numpy_searchsorted(a, v, side)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_duplicates_left_right(self):
        a = jnp.array([[0.0, 1.0, 1.0, 1.0, 2.0]])
        v = jnp.array([[1.0]])
        assert int(searchsorted(a, v, "left")[0, 0]) == 1
        assert int(searchsorted(a, v, "right")[0, 0]) == 4


class TestStratified:
    def test_det_linspace(self):
        z = stratified_z_vals(None, jnp.array([2.0]), jnp.array([6.0]), 5, perturb=False)
        np.testing.assert_allclose(z[0], [2, 3, 4, 5, 6], atol=1e-6)

    def test_lindisp(self):
        z = stratified_z_vals(None, jnp.array([1.0]), jnp.array([4.0]), 3, lindisp=True, perturb=False)
        np.testing.assert_allclose(1.0 / z[0], [1.0, 0.625, 0.25], atol=1e-6)

    def test_perturb_stays_in_intervals(self):
        key = jax.random.key(0)
        z = stratified_z_vals(key, jnp.zeros(128), jnp.ones(128), 64, perturb=True)
        assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0
        assert bool(jnp.all(jnp.diff(z, axis=-1) >= -1e-7))

    def test_perturb_bounds_match_reference_construction(self):
        base = jnp.array([[0.0, 1.0, 3.0, 7.0]])
        key = jax.random.key(1)
        z = perturb_z_vals(key, jnp.tile(base, (512, 1)))
        # Interval bounds: [0, .5], [.5, 2], [2, 5], [5, 7].
        lo = np.array([0.0, 0.5, 2.0, 5.0])
        hi = np.array([0.5, 2.0, 5.0, 7.0])
        assert bool(jnp.all(z >= lo - 1e-6)) and bool(jnp.all(z <= hi + 1e-6))


class TestSamplePdf:
    def test_det_uniform_weights_gives_linspace(self):
        bins = jnp.linspace(0.0, 1.0, 5)[None].repeat(2, axis=0)
        weights = jnp.ones((2, 4))
        s = sample_pdf(None, bins, weights, 9, det=True)
        np.testing.assert_allclose(s[0], np.linspace(0, 1, 9), atol=1e-4)

    @pytest.mark.slow
    def test_concentrates_on_heavy_bin(self):
        key = jax.random.key(2)
        bins = jnp.linspace(0.0, 1.0, 6)[None]
        weights = jnp.array([[0.0, 0.0, 100.0, 0.0, 0.0]])
        s = sample_pdf(key, bins, weights, 256)
        frac = float(jnp.mean((s >= 0.4) & (s <= 0.6)))
        assert frac > 0.95

    def test_monotone_in_u_and_in_range(self):
        key = jax.random.key(3)
        bins = jnp.sort(jax.random.uniform(key, (8, 63)), axis=-1)
        weights = jax.random.uniform(jax.random.fold_in(key, 1), (8, 62))
        s = sample_pdf(jax.random.fold_in(key, 2), bins, weights, 64)
        assert float(s.min()) >= float(bins.min()) - 1e-5
        assert float(s.max()) <= float(bins.max()) + 1e-5

    def test_matches_reference_inverse_cdf_semantics(self):
        """Manual inverse-CDF check: one known cdf, det samples."""
        bins = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        weights = jnp.array([[1.0, 1.0, 2.0]])  # cdf: 0, .25, .5, 1
        s = np.asarray(sample_pdf(None, bins, weights, 5, det=True))[0]
        # u = 0, .25, .5, .75, 1 -> depths 0, ~1, ~2, ~2.5, 3
        np.testing.assert_allclose(s, [0.0, 1.0, 2.0, 2.5, 3.0], atol=2e-3)


class TestOneHotGatherHelpers:
    """The r3c TPU-perf rewrites (``sampling/pdf.py:take_along_last``,
    ``sort_last_differentiable``) must be EXACT drop-ins for
    ``jnp.take_along_axis`` / ``jnp.sort`` in both forward values and
    VJPs — every parity artifact depends on that equivalence."""

    def test_take_along_last_forward_matches_take_along_axis(self):
        from scnerf_tpu.sampling.pdf import take_along_last

        key = jax.random.key(11)
        x = jax.random.normal(key, (8, 63))
        idx = jax.random.randint(jax.random.fold_in(key, 1), (8, 64), 0, 63)
        ref = jnp.take_along_axis(x, idx, axis=-1)
        np.testing.assert_array_equal(np.asarray(take_along_last(x, idx)),
                                      np.asarray(ref))

    @pytest.mark.slow
    def test_take_along_last_vjp_matches_take_along_axis(self):
        from scnerf_tpu.sampling.pdf import take_along_last

        key = jax.random.key(12)
        x = jax.random.normal(key, (4, 17))
        idx = jax.random.randint(jax.random.fold_in(key, 1), (4, 9), 0, 17)
        ct = jax.random.normal(jax.random.fold_in(key, 2), (4, 9))

        g_ours = jax.grad(lambda x: jnp.sum(take_along_last(x, idx) * ct))(x)
        g_ref = jax.grad(
            lambda x: jnp.sum(jnp.take_along_axis(x, idx, axis=-1) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   atol=1e-6)

    def test_sort_last_differentiable_forward_matches_sort_with_ties(self):
        from scnerf_tpu.sampling.pdf import sort_last_differentiable

        key = jax.random.key(13)
        # quantize to force ties: stable argsort must break them like sort
        x = jnp.round(jax.random.uniform(key, (16, 40)) * 8.0) / 8.0
        np.testing.assert_array_equal(
            np.asarray(sort_last_differentiable(x)),
            np.asarray(jnp.sort(x, axis=-1)))

    def test_sort_last_differentiable_vjp_matches_sort(self):
        from scnerf_tpu.sampling.pdf import sort_last_differentiable

        key = jax.random.key(14)
        x = jax.random.normal(key, (6, 23))  # distinct values: unique perm
        ct = jax.random.normal(jax.random.fold_in(key, 1), (6, 23))
        g_ours = jax.grad(
            lambda x: jnp.sum(sort_last_differentiable(x) * ct))(x)
        g_ref = jax.grad(lambda x: jnp.sum(jnp.sort(x, axis=-1) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   atol=1e-6)
