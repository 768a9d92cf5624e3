"""SSL whole-volume data plumbing (reference `self_supervised/data_utils.py`)."""

import json
import os

import numpy as np
import pytest

from waveformer_tpu.data.ssl_data import (
    SSLCropLoader,
    SSLVolumeDataset,
    crop_foreground_k_divisible,
    load_decathlon_datalist,
    scale_intensity_range,
)
from waveformer_tpu.utils import nifti


def _write_vol(path, shape=(24, 24, 24), seed=0, scale=500.0):
    rng = np.random.default_rng(seed)
    vol = (rng.standard_normal(shape) * scale).astype(np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    nifti.save(nifti.NiftiImage(data=vol), str(path))
    return vol


@pytest.fixture
def datalist_json(tmp_path):
    vols = []
    for i in range(4):
        p = tmp_path / "imgs" / f"ct_{i}.nii.gz"
        vols.append(_write_vol(p, seed=i))
    spec = {
        "training": [
            {"image": f"imgs/ct_{i}.nii.gz"} for i in range(3)
        ],
        "validation": ["imgs/ct_3.nii.gz"],
    }
    js = tmp_path / "dataset_ct_0.json"
    js.write_text(json.dumps(spec))
    return js, tmp_path


class TestDecathlonDatalist:
    def test_loads_and_resolves_relative_paths(self, datalist_json):
        js, base = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        assert len(items) == 3
        assert all(os.path.isabs(i["image"]) or str(base) in i["image"]
                   for i in items)
        assert all(os.path.exists(i["image"]) for i in items)

    def test_string_entries_become_image_dicts(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "validation")
        assert items[0].keys() == {"image"}
        assert os.path.exists(items[0]["image"])

    def test_missing_key_raises(self, datalist_json):
        js, _ = datalist_json
        with pytest.raises(ValueError, match="test"):
            load_decathlon_datalist(str(js), False, "test")

    def test_segmentation_requires_label(self, datalist_json):
        js, _ = datalist_json
        with pytest.raises(ValueError, match="label"):
            load_decathlon_datalist(str(js), True, "training")


class TestTransforms:
    def test_scale_intensity_range(self):
        img = np.array([-1000.0, 0.0, 1000.0, 2000.0])
        out = scale_intensity_range(img, -1000, 1000, 0.0, 1.0, clip=True)
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.0])

    def test_crop_foreground_k_divisible(self):
        vol = np.zeros((30, 30, 30), np.float32)
        vol[10:20, 5:15, 8:12] = 1.0
        out = crop_foreground_k_divisible(vol, (16, 16, 16))
        assert out.shape == (16, 16, 16)
        assert out.sum() == vol.sum()  # foreground preserved

    def test_crop_pads_when_box_exceeds_volume(self):
        vol = np.ones((10, 10, 10), np.float32)
        out = crop_foreground_k_divisible(vol, (16, 16, 16))
        assert out.shape == (16, 16, 16)
        assert out.sum() == 1000.0


class TestSSLVolumeDataset:
    def test_items_are_roi_divisible(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        ds = SSLVolumeDataset(items, roi=(16, 16, 16))
        v = ds[0]
        assert all(s % 16 == 0 and s >= 16 for s in v.shape)
        assert v.min() >= 0.0 and v.max() <= 1.0

    def test_cache_rate_caches_prefix(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        ds = SSLVolumeDataset(items, roi=(16, 16, 16), cache_rate=0.67)
        assert ds.cached_indices == [0, 1]
        np.testing.assert_array_equal(ds[0], ds._cache[0])

    def test_smart_cache_advances(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        ds = SSLVolumeDataset(items, roi=(16, 16, 16), smart_cache_num=2)
        assert ds.cached_indices == [0, 1]
        ds.advance()
        assert ds.cached_indices == [0, 2]  # window slid by 2 (mod 3)

    def test_cache_and_smartcache_exclusive(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        with pytest.raises(ValueError):
            SSLVolumeDataset(items, cache_rate=0.5, smart_cache_num=2)


class TestSSLCropLoader:
    def test_batch_shapes_and_count(self, datalist_json):
        js, _ = datalist_json
        items = load_decathlon_datalist(str(js), False, "training")
        ds = SSLVolumeDataset(items, roi=(16, 16, 16))
        loader = SSLCropLoader(
            ds, batch_size=3, num_samples=2, num_steps=5, seed=0
        )
        batches = list(loader)
        assert len(batches) == 5
        for b in batches:
            assert b.shape == (3, 16, 16, 16, 1)
            assert b.dtype == np.float32

    def test_worker_exception_propagates(self, datalist_json):
        js, _ = datalist_json
        items = [{"image": "/nonexistent/x.nii.gz"}]
        ds = SSLVolumeDataset(items, roi=(16, 16, 16))
        loader = SSLCropLoader(ds, batch_size=1, num_steps=1)
        with pytest.raises(Exception):
            list(loader)


class TestPretrainCLIWithDatalist:
    @pytest.mark.slow
    def test_smoke_short_run(self, datalist_json, tmp_path):
        """wtpu-pretrain-ssl end-to-end on a decathlon datalist (the
        reference's actual SSL data flow)."""
        from waveformer_tpu.scripts.pretrain_ssl import main

        js, _ = datalist_json
        logdir = tmp_path / "logs"
        main([
            "--datalist-json", str(js),
            "--logdir", str(logdir),
            "--num-steps", "2",
            "--batch-size", "2",
            "--patch-size", "16", "16", "16",
            "--vit-patch", "8",
            "--hidden-size", "32",
            "--num-layers", "1",
            "--num-heads", "4",
            "--eval-every", "2",
            "--platform", "cpu",
        ])
        assert (logdir / "pretrain.log").exists()
