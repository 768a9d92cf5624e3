"""CLI pipeline-script tests (the fast pieces; full chain driven manually)."""

import os
import pickle

import numpy as np
import pytest


class TestRename:
    def test_strips_brats_prefix(self, tmp_path):
        from waveformer_tpu.scripts.rename_data import rename_dataset

        case = tmp_path / "BraTS-GLI-00001-000"
        os.makedirs(case)
        for m in ("t1c", "seg"):
            (case / f"BraTS-GLI-00001-000-{m}.nii.gz").write_bytes(b"x")
        n = rename_dataset(str(tmp_path))
        assert n == 2
        assert sorted(os.listdir(case)) == ["seg.nii.gz", "t1c.nii.gz"]

    def test_dry_run_keeps_files(self, tmp_path):
        from waveformer_tpu.scripts.rename_data import rename_dataset

        case = tmp_path / "BraTS-GLI-00002-000"
        os.makedirs(case)
        (case / "BraTS-GLI-00002-000-t2w.nii.gz").write_bytes(b"x")
        rename_dataset(str(tmp_path), dry_run=True)
        assert os.listdir(case) == ["BraTS-GLI-00002-000-t2w.nii.gz"]

    def test_idempotent(self, tmp_path):
        from waveformer_tpu.scripts.rename_data import rename_dataset

        case = tmp_path / "c1"
        os.makedirs(case)
        (case / "t1c.nii.gz").write_bytes(b"x")
        assert rename_dataset(str(tmp_path)) == 0


class TestPreprocessScript:
    def test_plan_only(self, tmp_path, capsys):
        from waveformer_tpu.scripts.preprocess import main
        from waveformer_tpu.utils import nifti

        raw = tmp_path / "raw"
        for i in range(2):
            case = raw / f"c{i}"
            os.makedirs(case)
            img = np.random.default_rng(i).standard_normal((20, 20, 20)).astype(
                np.float32
            )
            nifti.save(nifti.NiftiImage(img), str(case / "t1c.nii.gz"))
            seg = np.zeros((20, 20, 20), np.int8)
            seg[5:10, 5:10, 5:10] = 1
            nifti.save(nifti.NiftiImage(seg), str(case / "seg.nii.gz"))
        out = tmp_path / "out"
        main([
            "--raw-dir", str(raw), "--out-dir", str(out),
            "--modalities", "t1c.nii.gz", "--plan-only",
        ])
        assert (out / "plans.json").exists()
