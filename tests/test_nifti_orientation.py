"""NIfTI orientation handling: qform parsing, RAS canonicalization, and
source-geometry write-back.

The reference reads via SimpleITK, which applies direction cosines
(`light_training/preprocessing/preprocessors/preprocessor_mri.py:58-89`) and
writes predictions back with CopyInformation semantics
(`light_training/prediction.py:209-227`). These tests prove our pure-numpy
equivalent: volumes stored in ANY axis-aligned orientation (LPS, flipped,
permuted) reach the pipeline in one canonical frame, and predictions land
voxel-exactly back in the source file's geometry.
"""

import struct

import numpy as np
import pytest

from waveformer_tpu.utils import nifti


def _random_affine(rng, jitter=0.05):
    """Random permutation+flip direction matrix with spacing and off-axis
    jitter (a realistic slightly-oblique scan)."""
    perm = rng.permutation(3)
    signs = rng.choice([-1, 1], 3)
    sp = rng.uniform(0.5, 3.0, 3)
    R = np.zeros((3, 3))
    for j in range(3):
        R[perm[j], j] = signs[j] * sp[j]
    R = R + rng.normal(0, jitter, (3, 3))
    aff = np.eye(4)
    aff[:3, :3] = R
    aff[:3, 3] = rng.normal(0, 10, 3)
    return aff.astype(np.float32)


class TestOrientationMath:
    def test_roundtrip_and_world_coords(self, rng):
        """Canonicalization preserves world coordinates exactly and is
        invertible — checked against direct index mapping (the oracle)."""
        for _ in range(50):
            aff = _random_affine(rng)
            shape = tuple(rng.integers(4, 9, 3))
            data = rng.normal(size=shape).astype(np.float32)
            img = nifti.NiftiImage(data=data, affine=aff)
            can, ornt = nifti.as_canonical(img)

            back = nifti.undo_canonical(can.data, ornt)
            assert np.array_equal(back, data)

            T = nifti.orientation_affine(ornt, can.data.shape)
            for _ in range(4):
                xp = np.array([rng.integers(0, s) for s in can.data.shape])
                x = (T @ np.append(xp, 1))[:3].astype(int)
                # same voxel value…
                assert can.data[tuple(xp)] == data[tuple(x)]
                # …at the same world position
                w_new = (np.asarray(can.affine, float) @ np.append(xp, 1))[:3]
                w_old = (np.asarray(aff, float) @ np.append(x, 1))[:3]
                np.testing.assert_allclose(w_new, w_old, atol=1e-3)

    def test_canonical_is_ras(self, rng):
        """After canonicalization the affine diagonal is dominant-positive
        (closest-RAS voxel order)."""
        for _ in range(20):
            img = nifti.NiftiImage(
                data=rng.normal(size=(5, 6, 7)).astype(np.float32),
                affine=_random_affine(rng),
            )
            can, _ = nifti.as_canonical(img)
            R = np.asarray(can.affine, float)[:3, :3]
            for k in range(3):
                assert R[k, k] > 0
                assert abs(R[k, k]) == pytest.approx(np.max(np.abs(R[:, k])))

    def test_identity_affine_is_noop(self, rng):
        data = rng.normal(size=(4, 5, 6)).astype(np.float32)
        img = nifti.NiftiImage(data=data, affine=np.eye(4, dtype=np.float32))
        can, ornt = nifti.as_canonical(img)
        assert np.array_equal(can.data, data)
        np.testing.assert_array_equal(ornt[:, 0], [0, 1, 2])
        np.testing.assert_array_equal(ornt[:, 1], [1, 1, 1])

    def test_scipy_oracle_lps_flip(self, rng):
        """LPS → RAS is a flip of the first two axes; compare against the
        explicit numpy oracle."""
        data = rng.normal(size=(6, 7, 8)).astype(np.float32)
        aff = np.diag([-1.5, -1.0, 2.0, 1.0]).astype(np.float32)  # LPS
        can, ornt = nifti.as_canonical(nifti.NiftiImage(data=data, affine=aff))
        oracle = np.flip(np.flip(data, 0), 1)
        assert np.array_equal(can.data, oracle)
        # spacing magnitudes preserved
        assert can.spacing == pytest.approx((1.5, 1.0, 2.0))


class TestQform:
    def test_qform_rotation_parsed(self, tmp_path, rng):
        """A file with only a qform (sform_code 0) yields the quaternion
        affine — here a 90° rotation about z with offset (1,2,3)."""
        data = rng.normal(size=(5, 6, 7)).astype(np.float32)
        p = str(tmp_path / "q.nii")
        nifti.save(
            nifti.NiftiImage(data=data, affine=np.eye(4, dtype=np.float32)), p
        )
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<h", raw, 254, 0)  # sform_code = 0
        struct.pack_into("<h", raw, 252, 1)  # qform_code = 1
        a = d = np.sqrt(0.5)
        struct.pack_into("<3f", raw, 256, 0.0, 0.0, d)  # b, c, d
        struct.pack_into("<3f", raw, 268, 1.0, 2.0, 3.0)  # qoffset
        struct.pack_into("<f", raw, 76, 1.0)  # pixdim[0] = qfac
        open(p, "wb").write(raw)
        img = nifti.load(p)
        expect = np.array(
            [[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]], float
        )
        np.testing.assert_allclose(img.affine, expect, atol=1e-5)
        assert np.array_equal(img.data, data)

    def test_qfac_negative_flips_third_column(self, tmp_path, rng):
        data = rng.normal(size=(4, 4, 4)).astype(np.float32)
        p = str(tmp_path / "q2.nii")
        nifti.save(
            nifti.NiftiImage(data=data, affine=np.eye(4, dtype=np.float32)), p
        )
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<h", raw, 254, 0)
        struct.pack_into("<h", raw, 252, 1)
        struct.pack_into("<3f", raw, 256, 0.0, 0.0, 0.0)  # identity rotation
        struct.pack_into("<3f", raw, 268, 0.0, 0.0, 0.0)
        struct.pack_into("<f", raw, 76, -1.0)  # qfac = -1
        open(p, "wb").write(raw)
        img = nifti.load(p)
        np.testing.assert_allclose(
            np.asarray(img.affine)[:3, :3], np.diag([1.0, 1.0, -1.0]), atol=1e-5
        )


class TestPipelineRoundTrip:
    """End-to-end: preprocess a non-RAS case, predict, write back — the
    prediction must overlay the RAW source file voxel-exactly."""

    def _write_case(self, tmp_path, rng, affine):
        # distinctive blob so orientation errors are detected
        shape = (20, 24, 18)  # (X, Y, Z) source voxel order
        vol = rng.normal(0.0, 0.05, shape).astype(np.float32)
        seg = np.zeros(shape, np.int8)
        vol[4:12, 6:16, 3:9] += 4.0
        seg[6:10, 8:14, 4:8] = 1
        case = tmp_path / "images" / "case_000"
        case.mkdir(parents=True)
        for mod in ("t2w.nii.gz", "t2f.nii.gz", "t1n.nii.gz", "t1c.nii.gz"):
            nifti.save(nifti.NiftiImage(data=vol, affine=affine), str(case / mod))
        nifti.save(nifti.NiftiImage(data=seg, affine=affine), str(case / "seg.nii.gz"))
        return vol, seg

    @pytest.mark.parametrize(
        "direction",
        [
            np.diag([-1.0, -1.0, 1.0, 1.0]),  # LPS (SimpleITK-style source)
            np.diag([1.0, -1.0, -1.0, 1.0]),  # PIR-ish flips
            # permutation: voxel axes (z, x, y) of world
            np.array(
                [
                    [0, 0, 1.2, 0],
                    [1.0, 0, 0, 0],
                    [0, 0.8, 0, 0],
                    [0, 0, 0, 1.0],
                ]
            ),
        ],
    )
    def test_predict_writes_source_geometry(self, tmp_path, rng, direction):
        from waveformer_tpu.data.preprocessing import MultiModalityPreprocessor
        from waveformer_tpu.inference.predictor import Predictor

        affine = direction.astype(np.float32)
        affine[:3, 3] = [5.0, -3.0, 7.0]
        vol, seg_src = self._write_case(tmp_path, rng, affine)

        pp = MultiModalityPreprocessor(
            base_dir=str(tmp_path), image_dir="images"
        )
        data, seg, props = pp.read_data("case_000")
        # canonical frame: (C, D, H, W); orientation recorded
        assert "orientation" in props and "source_affine" in props
        np.testing.assert_allclose(
            np.asarray(props["source_affine"]), affine, atol=1e-5
        )

        # oracle: canonicalize the source seg independently
        can_seg, ornt = nifti.as_canonical(
            nifti.NiftiImage(data=seg_src, affine=affine)
        )
        assert np.array_equal(seg[0], can_seg.data.T)

        # pretend the model predicted the GT in the canonical frame and
        # write it back: it must overlay the raw source seg voxel-exactly
        predictor = Predictor.__new__(Predictor)  # no inferer needed
        predictor.postprocess_largest_cc = False
        out = str(tmp_path / "pred.nii.gz")
        predictor.save_to_nii(seg[0], out, properties=props)

        written = nifti.load(out)
        assert np.array_equal(np.asarray(written.data), seg_src.astype(np.uint8))
        np.testing.assert_allclose(np.asarray(written.affine), affine, atol=1e-5)

    def test_full_preprocess_then_writeback(self, tmp_path, rng):
        """Through run_case_npy (crop+resample) and embed_to_original: the
        foreground blob must land on the source blob's voxels (IoU ≈ 1 up
        to resampling tolerance at the boundary)."""
        from waveformer_tpu.data.preprocessing import MultiModalityPreprocessor
        from waveformer_tpu.inference.predictor import Predictor

        affine = np.diag([-1.0, -1.0, 1.0, 1.0]).astype(np.float32)  # LPS, 1mm
        vol, seg_src = self._write_case(tmp_path, rng, affine)

        pp = MultiModalityPreprocessor(
            base_dir=str(tmp_path), image_dir="images"
        )
        data, seg, props = pp.read_data("case_000")
        data, seg, props = pp.run_case_npy(data, seg, props)

        predictor = Predictor.__new__(Predictor)
        predictor.postprocess_largest_cc = False
        # the "prediction" is the preprocessed GT; restore original geometry
        seg_full = predictor.embed_to_original(seg[0].astype(np.uint8), props)
        out = str(tmp_path / "pred.nii.gz")
        predictor.save_to_nii(seg_full, out, properties=props)

        written = np.asarray(nifti.load(out).data)
        src = (seg_src > 0).astype(np.uint8)
        inter = np.logical_and(written > 0, src > 0).sum()
        union = np.logical_or(written > 0, src > 0).sum()
        assert union > 0 and inter / union > 0.95
