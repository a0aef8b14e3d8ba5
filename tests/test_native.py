"""Native host library tests (g++-built ctypes bindings vs numpy oracles)."""
import numpy as np
import pytest

from scnerf_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("g++ toolchain unavailable; numpy fallback covers API")


class TestNativeSearchsorted:
    @pytest.mark.parametrize("side", ["left", "right"])
    @pytest.mark.parametrize("Ba,Bv", [(4, 4), (1, 4), (4, 1)])
    def test_vs_numpy(self, side, Ba, Bv):
        rng = np.random.RandomState(0)
        a = np.sort(rng.randn(Ba, 100).astype(np.float32), axis=-1)
        v = rng.randn(Bv, 37).astype(np.float32)
        got = native.searchsorted_host(a, v, side)
        rows = max(Ba, Bv)
        want = np.stack(
            [np.searchsorted(a[i % Ba], v[i % Bv], side=side) for i in range(rows)]
        )
        np.testing.assert_array_equal(got, want)

    def test_duplicates(self):
        a = np.array([[0.0, 1.0, 1.0, 1.0, 2.0]], np.float32)
        v = np.array([[1.0]], np.float32)
        assert native.searchsorted_host(a, v, "left")[0, 0] == 1
        assert native.searchsorted_host(a, v, "right")[0, 0] == 4


class TestNativePoolOps:
    def test_permutation_deterministic_and_complete(self):
        p1 = native.permutation_host(1000, seed=42)
        p2 = native.permutation_host(1000, seed=42)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(np.sort(p1), np.arange(1000))
        p3 = native.permutation_host(1000, seed=43)
        assert (p1 != p3).any()

    def test_gather_rows(self):
        data = np.arange(20, dtype=np.float32).reshape(5, 4)
        idx = np.array([3, 0, 3], np.int64)
        np.testing.assert_array_equal(native.gather_rows_host(data, idx), data[idx])

    def test_gather_pixels(self):
        rng = np.random.RandomState(1)
        imgs = rng.rand(2, 6, 7, 3).astype(np.float32)
        px = np.array([0, 6, 3], np.int64)
        py = np.array([5, 0, 2], np.int64)
        ii = np.array([0, 1, 1], np.int64)
        got = native.gather_pixels_host(imgs, ii, px, py)
        np.testing.assert_array_equal(got, imgs[ii, py, px])
