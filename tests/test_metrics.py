"""Metric parity tests: Dice/HD95 vs hand-built references, NIfTI roundtrip."""

import numpy as np
import pytest

from waveformer_tpu.metrics.segmentation import (
    ConfusionStats,
    brats_case_metrics,
    cal_metric,
    convert_labels_brats,
    dice,
    dice_jax,
    hausdorff_distance_95,
)


class TestDice:
    def test_perfect(self, rng):
        m = rng.integers(0, 2, (16, 16, 16))
        assert dice(m, m) == 1.0

    def test_disjoint(self):
        a = np.zeros((8, 8, 8))
        b = np.zeros((8, 8, 8))
        a[:4] = 1
        b[4:] = 1
        assert dice(a, b) == 0.0

    def test_known_value(self):
        a = np.zeros((4, 4, 4))
        b = np.zeros((4, 4, 4))
        a[0, 0, :2] = 1  # |A| = 2
        b[0, 0, :4] = 1  # |B| = 4, overlap 2
        assert dice(a, b) == pytest.approx(2 * 2 / (2 + 4))

    def test_confusion_stats(self):
        a = np.array([1, 1, 0, 0])
        b = np.array([1, 0, 1, 0])
        cs = ConfusionStats(a, b)
        assert (cs.tp, cs.fp, cs.fn, cs.tn) == (1, 1, 1, 1)
        assert cs.precision() == 0.5 and cs.recall() == 0.5
        assert cs.accuracy() == 0.5
        assert cs.fscore() == pytest.approx(0.5)


class TestHD95:
    def test_identical_zero(self):
        m = np.zeros((16, 16, 16))
        m[4:12, 4:12, 4:12] = 1
        assert hausdorff_distance_95(m, m) == 0.0

    def test_translated_cube(self):
        a = np.zeros((32, 32, 32))
        b = np.zeros((32, 32, 32))
        a[8:16, 8:16, 8:16] = 1
        b[11:19, 8:16, 8:16] = 1  # shifted 3 voxels along axis 0
        hd = hausdorff_distance_95(a, b)
        assert 2.0 <= hd <= 3.0 + 1e-6

    def test_voxelspacing(self):
        a = np.zeros((32, 16, 16))
        b = np.zeros((32, 16, 16))
        a[8:10, 4:12, 4:12] = 1
        b[12:14, 4:12, 4:12] = 1
        hd_iso = hausdorff_distance_95(a, b, (1, 1, 1))
        hd_aniso = hausdorff_distance_95(a, b, (2, 1, 1))
        assert hd_aniso > hd_iso


class TestBraTSConventions:
    def test_convert_labels(self):
        lab = np.array([[[0, 1, 2, 3]]])
        out = convert_labels_brats(lab)
        np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 0, 1])  # TC
        np.testing.assert_array_equal(out[1, 0, 0], [0, 1, 1, 1])  # WT
        np.testing.assert_array_equal(out[2, 0, 0], [0, 0, 0, 1])  # ET

    def test_empty_conventions(self):
        empty = np.zeros((8, 8, 8))
        full = np.ones((8, 8, 8))
        np.testing.assert_array_equal(cal_metric(empty, full), [0.0, 50.0])
        np.testing.assert_array_equal(cal_metric(empty, empty), [0.0, 50.0])

    def test_case_metrics_shape(self, rng):
        gt = rng.integers(0, 4, (32, 32, 32))
        pred = rng.integers(0, 4, (32, 32, 32))
        m = brats_case_metrics(gt, pred)
        assert m.shape == (3, 2)
        assert (m[:, 0] >= 0).all() and (m[:, 0] <= 1).all()


class TestDiceJax:
    def test_matches_numpy(self, rng):
        import jax.numpy as jnp

        p = rng.integers(0, 2, (2, 8, 8, 8)).astype(np.float32)
        g = rng.integers(0, 2, (2, 8, 8, 8)).astype(np.float32)
        got = np.asarray(dice_jax(jnp.asarray(p), jnp.asarray(g)))
        want = [dice(p[i], g[i]) for i in range(2)]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_empty_conventions(self):
        import jax.numpy as jnp

        z = jnp.zeros((1, 4, 4, 4))
        o = jnp.ones((1, 4, 4, 4))
        assert float(dice_jax(z, z)[0]) == 1.0
        assert float(dice_jax(z, o)[0]) == pytest.approx(0.0, abs=1e-6)


class TestNifti:
    def test_roundtrip(self, tmp_path, rng):
        from waveformer_tpu.utils import nifti

        data = rng.integers(0, 4, (19, 23, 17)).astype(np.uint8)
        affine = np.diag([1.0, 1.0, 2.5, 1.0]).astype(np.float32)
        p = str(tmp_path / "seg.nii.gz")
        nifti.save(nifti.NiftiImage(data=data, affine=affine), p)
        img = nifti.load(p)
        np.testing.assert_array_equal(img.data, data)
        np.testing.assert_allclose(img.spacing, (1.0, 1.0, 2.5))

    def test_float_roundtrip_uncompressed(self, tmp_path, rng):
        from waveformer_tpu.utils import nifti

        data = rng.standard_normal((8, 9, 10)).astype(np.float32)
        p = str(tmp_path / "vol.nii")
        nifti.save(nifti.NiftiImage(data=data), p)
        img = nifti.load(p)
        np.testing.assert_allclose(img.data, data, rtol=1e-6)
