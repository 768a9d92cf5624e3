"""Native C++ data-kernel tests: build, parity vs scipy, performance sanity."""

import numpy as np
import pytest

from waveformer_tpu import runtime


@pytest.fixture(scope="module")
def native_available():
    ok = runtime.available()
    if not ok:
        pytest.skip("native build unavailable")
    return ok


class TestAffine:
    def test_identity(self, native_available, rng):
        v = rng.standard_normal((16, 18, 20)).astype(np.float32)
        out = runtime.affine_transform(v, np.eye(3), np.zeros(3), order=1)
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_matches_scipy_trilinear(self, native_available, rng):
        from scipy import ndimage

        v = rng.standard_normal((24, 24, 24)).astype(np.float32)
        ang = 0.3
        m = np.array(
            [[1, 0, 0],
             [0, np.cos(ang), -np.sin(ang)],
             [0, np.sin(ang), np.cos(ang)]]
        )
        center = (np.asarray(v.shape) - 1) / 2
        off = center - m @ center
        got = runtime.affine_transform(v, m, off, order=1)
        want = ndimage.affine_transform(
            v, m, offset=off, order=1, mode="constant", cval=0.0
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_nearest_labels(self, native_available, rng):
        from scipy import ndimage

        v = rng.integers(0, 4, (20, 20, 20)).astype(np.float32)
        # irrational-ish scale avoids exact .5 sample coordinates, whose
        # tie-breaks are fp-order-dependent across implementations
        m = np.eye(3) * 1.1737
        center = (np.asarray(v.shape) - 1) / 2
        off = center - m @ center
        got = runtime.affine_transform(v, m, off, order=0, cval=-1)
        want = ndimage.affine_transform(
            v, m, offset=off, order=0, mode="constant", cval=-1
        )
        assert (got == want).mean() > 0.999


class TestBlur:
    def test_matches_scipy(self, native_available, rng):
        from scipy import ndimage

        v = rng.standard_normal((24, 24, 24)).astype(np.float32)
        got = runtime.gaussian_blur(v, 0.8)
        want = ndimage.gaussian_filter(v, 0.8)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_preserves_mean(self, native_available, rng):
        v = rng.standard_normal((16, 16, 16)).astype(np.float32)
        out = runtime.gaussian_blur(v, 1.0)
        np.testing.assert_allclose(out.mean(), v.mean(), atol=1e-3)


class TestCropPad:
    def test_inbounds(self, native_available, rng):
        v = rng.standard_normal((2, 20, 20, 20)).astype(np.float32)
        out = runtime.crop_pad(v, (2, 3, 4), (8, 8, 8))
        np.testing.assert_array_equal(out, v[:, 2:10, 3:11, 4:12])

    def test_out_of_bounds_fill(self, native_available, rng):
        v = rng.standard_normal((1, 10, 10, 10)).astype(np.float32)
        out = runtime.crop_pad(v, (-4, 6, -2), (8, 8, 8), fill=-1.0)
        assert out.shape == (1, 8, 8, 8)
        assert (out[0, :4] == -1.0).all()  # d < 0 region
        assert (out[0, :, 4:] == -1.0).all()  # h >= 10 region
        np.testing.assert_array_equal(
            out[0, 4:, :4, 2:], v[0, 0:4, 6:10, 0:6]
        )

    def test_matches_python_fallback(self, native_available, rng):
        import os

        v = rng.standard_normal((3, 15, 17, 13)).astype(np.float32)
        got = runtime.crop_pad(v, (-2, 5, 10), (8, 8, 8), fill=0.5)
        # compute fallback manually
        c = v.shape[0]
        want = np.full((c, 8, 8, 8), 0.5, np.float32)
        corner = (-2, 5, 10)
        src = [slice(max(0, corner[d]), min(v.shape[1 + d], corner[d] + 8))
               for d in range(3)]
        dst = [slice(src[d].start - corner[d], src[d].stop - corner[d])
               for d in range(3)]
        want[(slice(None), *dst)] = v[(slice(None), *src)]
        np.testing.assert_array_equal(got, want)


class TestPerf:
    def test_affine_faster_than_scipy(self, native_available, rng):
        import time

        from scipy import ndimage

        v = rng.standard_normal((96, 96, 96)).astype(np.float32)
        m = np.eye(3) * 1.1
        off = np.zeros(3)
        t0 = time.time()
        for _ in range(3):
            runtime.affine_transform(v, m, off, order=1)
        t_native = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            ndimage.affine_transform(v, m, offset=off, order=1)
        t_scipy = time.time() - t0
        # OpenMP + trilinear should beat scipy's single-thread spline path
        assert t_native < t_scipy, (t_native, t_scipy)
