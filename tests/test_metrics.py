"""Metric parity tests: Dice/HD95 vs hand-built references, NIfTI roundtrip."""

import numpy as np
import pytest

from waveformer_tpu.metrics.segmentation import (
    ALL_METRICS,
    ConfusionStats,
    average_surface_distance,
    average_surface_distance_symmetric,
    brats_case_metrics,
    cal_metric,
    convert_labels_brats,
    dice,
    dice_jax,
    evaluate_metrics,
    hausdorff_distance,
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


class TestMedpyGoldens:
    """Checked-in golden values from the line-faithful medpy transcription
    (`tools/gen_metric_goldens.py`; regenerate with that script). These pin
    the full surface-distance protocol — erosion footprint, XOR border,
    EDT sampling, POOLED hd95 percentile — to medpy's conventions
    (reference `5_compute_metrics.py:15-21`)."""

    @pytest.fixture(scope="class")
    def goldens(self):
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "fixtures", "metric_goldens.json"
        )
        with open(path) as f:
            return json.load(f)

    def _cases(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "gen_metric_goldens",
            os.path.join(
                os.path.dirname(__file__), "..", "tools",
                "gen_metric_goldens.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return {name: (p, g, sp) for name, p, g, sp in mod.cases()}

    def test_all_goldens(self, goldens):
        cases = self._cases()
        assert set(goldens) == set(cases)
        for name, vals in goldens.items():
            pred, gt, spacing = cases[name]
            np.testing.assert_allclose(
                dice(pred, gt), vals["dice"], rtol=1e-12, err_msg=name)
            np.testing.assert_allclose(
                hausdorff_distance(pred, gt, spacing), vals["hd"],
                rtol=1e-10, err_msg=name)
            np.testing.assert_allclose(
                hausdorff_distance_95(pred, gt, spacing), vals["hd95"],
                rtol=1e-10, err_msg=name)
            np.testing.assert_allclose(
                average_surface_distance(pred, gt, spacing), vals["asd"],
                rtol=1e-10, err_msg=name)
            np.testing.assert_allclose(
                average_surface_distance_symmetric(pred, gt, spacing),
                vals["assd"], rtol=1e-10, err_msg=name)


class TestMetricRegistry:
    """Name-keyed registry parity (`evaluation/metric.py:385-405`)."""

    REF_KEYS = {
        "False Positive Rate", "Dice", "Jaccard", "Hausdorff Distance",
        "Hausdorff Distance 95", "Precision", "Recall",
        "Avg. Symmetric Surface Distance", "Avg. Surface Distance",
        "Accuracy", "False Omission Rate", "Negative Predictive Value",
        "False Negative Rate", "True Negative Rate", "False Discovery Rate",
        "Total Positives Test", "Total Negatives Test",
        "Total Positives Reference", "total Negatives Reference",
    }

    def test_registry_keys_verbatim(self):
        assert set(ALL_METRICS) == self.REF_KEYS

    def test_rates_known_confusion(self):
        # pred: 12 voxels, gt: 8 voxels, overlap 6, in a 4x4x4=64 volume
        pred = np.zeros((4, 4, 4), bool)
        gt = np.zeros((4, 4, 4), bool)
        pred.flat[:12] = True
        gt.flat[6:14] = True
        # tp=6 fp=6 fn=2 tn=50
        out = evaluate_metrics(
            pred, gt,
            ["False Positive Rate", "False Omission Rate",
             "False Negative Rate", "True Negative Rate",
             "False Discovery Rate", "Negative Predictive Value",
             "Accuracy", "Total Positives Test", "Total Negatives Test",
             "Total Positives Reference", "total Negatives Reference"],
        )
        np.testing.assert_allclose(out["False Positive Rate"], 6 / 56)
        np.testing.assert_allclose(out["False Omission Rate"], 2 / 52)
        np.testing.assert_allclose(out["False Negative Rate"], 2 / 8)
        np.testing.assert_allclose(out["True Negative Rate"], 50 / 56)
        np.testing.assert_allclose(out["False Discovery Rate"], 6 / 12)
        np.testing.assert_allclose(out["Negative Predictive Value"], 50 / 52)
        np.testing.assert_allclose(out["Accuracy"], 56 / 64)
        assert out["Total Positives Test"] == 12
        assert out["Total Negatives Test"] == 52
        assert out["Total Positives Reference"] == 8
        assert out["total Negatives Reference"] == 56

    def test_nan_for_nonexisting_conventions(self):
        empty = np.zeros((3, 3, 3), bool)
        full = np.ones((3, 3, 3), bool)
        some = np.zeros((3, 3, 3), bool)
        some[1, 1, 1] = True
        # dice/jaccard: NaN only when BOTH empty (`metric.py:88-96`)
        assert np.isnan(ALL_METRICS["Dice"](empty, empty))
        assert ALL_METRICS["Dice"](some, empty) == 0.0
        # precision: NaN when test empty; recall: NaN when reference empty
        assert np.isnan(ALL_METRICS["Precision"](empty, some))
        assert np.isnan(ALL_METRICS["Recall"](some, empty))
        # FOR/NPV: NaN when test full; TNR/FPR: NaN when reference full
        assert np.isnan(ALL_METRICS["False Omission Rate"](full, some))
        assert np.isnan(ALL_METRICS["Negative Predictive Value"](full, some))
        assert np.isnan(ALL_METRICS["True Negative Rate"](some, full))
        assert np.isnan(ALL_METRICS["False Positive Rate"](some, full))
        # surface metrics: NaN for empty OR full masks
        assert np.isnan(ALL_METRICS["Hausdorff Distance 95"](empty, some))
        assert np.isnan(ALL_METRICS["Avg. Surface Distance"](some, full))
        # nan_for_nonexisting=False → 0
        assert ALL_METRICS["Precision"](
            empty, some, nan_for_nonexisting=False) == 0.0

    def test_surface_metrics_through_registry(self):
        a = np.zeros((16, 16, 16), bool)
        b = np.zeros((16, 16, 16), bool)
        a[4:10, 4:10, 4:10] = True
        b[6:12, 4:10, 4:10] = True
        out = evaluate_metrics(
            a, b,
            ["Hausdorff Distance", "Hausdorff Distance 95",
             "Avg. Surface Distance", "Avg. Symmetric Surface Distance"],
            voxel_spacing=(1.0, 1.0, 1.0),
        )
        assert out["Hausdorff Distance"] == hausdorff_distance(a, b, (1, 1, 1))
        assert out["Hausdorff Distance 95"] == hausdorff_distance_95(
            a, b, (1, 1, 1))
        assert out["Avg. Surface Distance"] == average_surface_distance(
            a, b, (1, 1, 1))

    def test_unknown_metric_raises(self):
        with pytest.raises(KeyError):
            evaluate_metrics(
                np.ones((2, 2, 2), bool), np.ones((2, 2, 2), bool),
                ["NoSuchMetric"],
            )
