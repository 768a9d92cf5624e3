"""Data engine tests: preprocessing geometry, dataset, sampler, augment,
prefetch pipeline — end-to-end on synthetic NIfTI cases."""

import os
import pickle

import numpy as np
import pytest

from waveformer_tpu.data.augment import (
    Compose,
    GammaTransform,
    MirrorTransform,
    RemoveLabelTransform,
    SpatialTransform,
    get_train_transforms,
)
from waveformer_tpu.data.dataset import (
    MedicalDataset,
    get_kfold_loader,
    get_train_val_test_loader_from_train,
    unpack_dataset,
)
from waveformer_tpu.data.patch_sampler import PatchSampler
from waveformer_tpu.data.pipeline import PrefetchLoader
from waveformer_tpu.data.preprocessing import (
    MultiModalityPreprocessor,
    ZScoreNormalization,
    compute_new_shape,
    crop_to_nonzero,
    resample_data_or_seg_to_shape,
    sample_foreground_locations,
)


@pytest.fixture(scope="module")
def raw_dataset(tmp_path_factory):
    """4 synthetic BraTS-like cases: 2 modalities + seg as .nii.gz."""
    from waveformer_tpu.utils import nifti

    root = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    img_dir = root / "images"
    for i in range(4):
        case = img_dir / f"case_{i:03d}"
        os.makedirs(case)
        shape = (40 + i, 44, 38)  # (X, Y, Z) in nifti frame
        affine = np.diag([1.0, 1.0, 1.2, 1.0]).astype(np.float32)
        brain = np.zeros(shape, np.float32)
        brain[6:-6, 7:-7, 5:-5] = rng.standard_normal(
            (shape[0] - 12, shape[1] - 14, shape[2] - 10)
        ).astype(np.float32) + 3.0
        for mod in ("t1.nii.gz", "t2.nii.gz"):
            nifti.save(nifti.NiftiImage(data=brain, affine=affine), str(case / mod))
        seg = np.zeros(shape, np.int8)
        seg[15:25, 15:25, 12:20] = 1
        seg[18:22, 18:22, 14:17] = 3
        nifti.save(nifti.NiftiImage(data=seg, affine=affine), str(case / "seg.nii.gz"))
    return str(root)


@pytest.fixture(scope="module")
def preprocessed(raw_dataset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fullres"))
    pp = MultiModalityPreprocessor(
        base_dir=raw_dataset,
        image_dir="images",
        data_filenames=("t1.nii.gz", "t2.nii.gz"),
        seg_filename="seg.nii.gz",
        foreground_classes=(1, 3),
    )
    done = pp.run(out, num_processes=1)
    assert len(done) == 4
    return out


class TestPreprocessing:
    def test_crop_to_nonzero_geometry(self):
        data = np.zeros((1, 10, 12, 14), np.float32)
        data[0, 2:8, 3:9, 4:10] = 1.0
        seg = np.zeros((1, 10, 12, 14), np.int8)
        d, s, bbox = crop_to_nonzero(data, seg)
        assert bbox == [[2, 8], [3, 9], [4, 10]]
        assert d.shape == (1, 6, 6, 6)
        # outside-mask background got -1 (all-inside here so none)
        assert (s != -1).all()

    def test_zscore(self, rng):
        img = rng.standard_normal((8, 8, 8)).astype(np.float32) * 5 + 3
        out = ZScoreNormalization().run(img, np.zeros_like(img))
        assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-3

    def test_compute_new_shape(self):
        assert compute_new_shape((100, 100, 50), (1, 1, 2), (1, 1, 1)) == (
            100, 100, 100,
        )

    def test_seg_resample_preserves_labels(self, rng):
        seg = np.zeros((1, 12, 12, 12), np.int8)
        seg[0, 4:8, 4:8, 4:8] = 3
        out = resample_data_or_seg_to_shape(
            seg, (24, 24, 24), (2, 2, 2), (1, 1, 1), is_seg=True
        )
        assert set(np.unique(out)) <= {0, 3}
        assert (out == 3).sum() > 0

    def test_anisotropic_separate_z(self, rng):
        data = rng.standard_normal((1, 8, 32, 32)).astype(np.float32)
        out = resample_data_or_seg_to_shape(
            data, (32, 32, 32), (4.0, 1.0, 1.0), (1.0, 1.0, 1.0)
        )
        assert out.shape == (1, 32, 32, 32)

    def test_fg_sampling(self):
        seg = np.zeros((1, 20, 20, 20), np.int8)
        seg[0, :10] = 1
        locs = sample_foreground_locations(seg, (1, 2))
        assert len(locs[1]) > 0
        assert len(locs[2]) == 0
        assert (seg[tuple(locs[1].T)] == 1).all()

    def test_case_artifacts_and_properties(self, preprocessed):
        files = sorted(os.listdir(preprocessed))
        assert "case_000.npz" in files and "case_000.pkl" in files
        with open(os.path.join(preprocessed, "case_000.pkl"), "rb") as f:
            props = pickle.load(f)
        for key in (
            "spacing",
            "shape_before_cropping",
            "bbox_used_for_cropping",
            "shape_after_cropping_before_resample",
            "shape_after_resample",
            "class_locations",
        ):
            assert key in props, key
        # resampled to 1mm: z extent grew by 1.2×
        before = props["shape_after_cropping_before_resample"]
        after = props["shape_after_resample"]
        assert after[0] == round(before[0] * 1.2)

    def test_plan(self, raw_dataset):
        pp = MultiModalityPreprocessor(
            base_dir=raw_dataset, image_dir="images",
            data_filenames=("t1.nii.gz", "t2.nii.gz"),
            seg_filename="seg.nii.gz",
        )
        plan = pp.run_plan()
        assert plan["n_cases_fingerprinted"] == 4
        assert 0 in plan["intensities_per_channel"]
        assert len(plan["suggested_patch_size"]) == 3


class TestDataset:
    def test_unpack_and_memmap(self, preprocessed):
        ds = MedicalDataset(preprocessed, ["case_000"], unpack=True,
                            num_processes=1)
        item = ds[0]
        assert isinstance(item["data"], np.memmap)
        assert item["data"].shape[0] == 2
        assert item["seg"].shape[0] == 1

    def test_split_persistence(self, preprocessed, tmp_path):
        split_dir = str(tmp_path / "split")
        tr, va, te = get_train_val_test_loader_from_train(
            preprocessed, split_dir=split_dir, val_fraction=0.25, unpack=False
        )
        assert len(tr) == 3 and len(va) == 1 and len(te) == 0
        tr2, va2, _ = get_train_val_test_loader_from_train(
            preprocessed, split_dir=split_dir, unpack=False
        )
        assert tr2.case_names == tr.case_names

    def test_test_list(self, preprocessed, tmp_path):
        tl = tmp_path / "test_list.pkl"
        with open(tl, "wb") as f:
            pickle.dump(["case_003"], f)
        tr, va, te = get_train_val_test_loader_from_train(
            preprocessed, test_list_path=str(tl), val_fraction=0.34,
            unpack=False,
        )
        assert te.case_names == ["case_003"]
        assert "case_003" not in tr.case_names + va.case_names

    def test_kfold(self, preprocessed):
        tr, va = get_kfold_loader(preprocessed, fold=0, n_folds=4, unpack=False)
        assert len(tr) == 3 and len(va) == 1


class TestPatchSampler:
    def test_patch_shape_and_padding(self, preprocessed):
        ds = MedicalDataset(preprocessed, ["case_000"], unpack=False)
        sampler = PatchSampler(ds, patch_size=(64, 64, 64), batch_size=3,
                               seed=0)
        batch = sampler.generate_batch()
        assert batch["data"].shape == (3, 2, 64, 64, 64)
        assert batch["seg"].shape == (3, 1, 64, 64, 64)

    def test_fg_oversampling_hits_foreground(self, preprocessed):
        ds = MedicalDataset(preprocessed, ["case_000"], unpack=False)
        sampler = PatchSampler(ds, patch_size=(16, 16, 16), batch_size=3,
                               oversample_foreground_percent=0.34, seed=0)
        # last sample of each batch is forced-fg; over many draws it must
        # contain foreground almost always
        hits = 0
        for _ in range(10):
            b = sampler.generate_batch()
            if (b["seg"][-1] > 0).any():
                hits += 1
        assert hits >= 9


class TestAugment:
    def _sample(self, rng):
        return {
            "data": rng.standard_normal((2, 24, 24, 24)).astype(np.float32),
            "seg": (rng.integers(-1, 3, (1, 24, 24, 24))).astype(np.float32),
        }

    def test_full_stack_shapes(self, rng):
        t = get_train_transforms()
        out = t(self._sample(rng), np.random.RandomState(0))
        assert out["data"].shape == (2, 24, 24, 24)
        assert (out["seg"] != -1).all()  # RemoveLabel applied

    def test_mirror_deterministic_seed(self, rng):
        s = self._sample(rng)
        m = MirrorTransform()
        a = m(s, np.random.RandomState(3))["data"]
        b = m(s, np.random.RandomState(3))["data"]
        np.testing.assert_array_equal(a, b)

    def test_spatial_preserves_labels(self, rng):
        s = self._sample(rng)
        s["seg"] = np.round(s["seg"])
        out = SpatialTransform(p_rotation=1.0, p_scaling=1.0)(
            s, np.random.RandomState(0)
        )
        assert set(np.unique(out["seg"])) <= {-1.0, 0.0, 1.0, 2.0}

    def test_gamma_retain_stats(self, rng):
        s = self._sample(rng)
        out = GammaTransform(p=1.0)(s, np.random.RandomState(0))
        np.testing.assert_allclose(
            out["data"][0].mean(), s["data"][0].mean(), atol=1e-3
        )


class TestPipeline:
    def test_inline_loader(self, preprocessed):
        ds = MedicalDataset(preprocessed, ["case_000", "case_001"], unpack=False)
        loader = PrefetchLoader(
            ds, steps_per_epoch=3, patch_size=(32, 32, 32), batch_size=2,
            transform="train", num_workers=0, seed=1,
        )
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["data"].shape == (2, 32, 32, 32, 2)  # channels-last
        assert batches[0]["seg"].shape == (2, 32, 32, 32, 1)
        assert (batches[0]["seg"] >= 0).all()

    def test_multiprocess_loader(self, preprocessed):
        ds = MedicalDataset(preprocessed, ["case_000", "case_001"], unpack=False)
        loader = PrefetchLoader(
            ds, steps_per_epoch=4, patch_size=(32, 32, 32), batch_size=2,
            transform="noaug", num_workers=2, cache_size=2, seed=1,
        )
        try:
            batches = list(loader)
            assert len(batches) == 4
            for b in batches:
                assert b["data"].shape == (2, 32, 32, 32, 2)
                assert np.isfinite(b["data"]).all()
        finally:
            loader.shutdown()


class TestDatasetVariants:
    def test_global_context(self, preprocessed):
        from waveformer_tpu.data.dataset_variants import GlobalContextDataset

        base = MedicalDataset(preprocessed, ["case_000"], unpack=False)
        ds = GlobalContextDataset(base, global_shape=(16, 16, 16))
        item = ds[0]
        assert item["data_global"].shape == (2, 16, 16, 16)
        # cached on second access (same object)
        assert ds[0]["data_global"] is item["data_global"]

    def test_sdm_edge(self, preprocessed):
        from waveformer_tpu.data.dataset_variants import (
            SDMEdgeDataset,
            edge_map,
            signed_distance_map,
        )

        base = MedicalDataset(preprocessed, ["case_000"], unpack=False)
        ds = SDMEdgeDataset(base, foreground_classes=(1, 3))
        item = ds[0]
        assert item["seg_sdm"].shape[0] == 2
        assert item["seg_edge"].shape[0] == 1
        seg = np.asarray(item["seg"][0])
        sdm = item["seg_sdm"][0]
        if (seg == 1).any():
            assert sdm[seg == 1].mean() < 0  # negative inside
            assert sdm[seg != 1].mean() > 0  # positive outside
        # edge is a thin subset of the foreground
        edge = item["seg_edge"][0]
        assert edge.sum() < (seg > 0).sum()

    def test_sdm_empty_mask(self):
        from waveformer_tpu.data.dataset_variants import signed_distance_map

        z = signed_distance_map(np.zeros((8, 8, 8), bool))
        np.testing.assert_array_equal(z, 0.0)


class TestCTPreprocessors:
    """Flat-file (liver2017) and per-organ-mask (AbdomenAtlas) CT dataset
    drivers, end-to-end: discovery → fingerprint → CT-normalized artifacts.
    Reference: `default_preprocessor_liver_2017.py:231-259`,
    `default_preprocessor_AbdomenAtlas1_0Mini.py:235-272`."""

    @pytest.fixture(scope="class")
    def liver_raw(self, tmp_path_factory):
        from waveformer_tpu.utils import nifti

        root = tmp_path_factory.mktemp("liver_raw")
        rng = np.random.default_rng(1)
        affine = np.diag([0.8, 0.8, 2.5, 1.0]).astype(np.float32)
        for i in range(3):
            shape = (30, 32, 20)
            vol = rng.normal(40.0, 120.0, shape).astype(np.float32)
            seg = np.zeros(shape, np.int8)
            seg[8:20, 8:20, 6:14] = 1  # liver
            seg[12:16, 12:16, 8:11] = 2  # tumor
            vol[seg > 0] += 60.0
            nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                       str(root / f"volume-{i}.nii.gz"))
            nifti.save(nifti.NiftiImage(data=seg, affine=affine),
                       str(root / f"segmentation-{i}.nii.gz"))
        return str(root)

    @pytest.fixture(scope="class")
    def atlas_raw(self, tmp_path_factory):
        from waveformer_tpu.utils import nifti

        root = tmp_path_factory.mktemp("atlas_raw")
        rng = np.random.default_rng(2)
        affine = np.diag([1.0, 1.0, 3.0, 1.0]).astype(np.float32)
        for name in ("BDMAP_00000001", "BDMAP_00000002"):
            case = root / name
            segs = case / "segmentations"
            os.makedirs(segs)
            shape = (28, 28, 16)
            vol = rng.normal(30.0, 100.0, shape).astype(np.float32)
            nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                       str(case / "ct.nii.gz"))
            liver = np.zeros(shape, np.uint8)
            liver[4:14, 4:14, 4:10] = 1
            spleen = np.zeros(shape, np.uint8)
            spleen[10:20, 10:20, 6:12] = 1  # overlaps liver: spleen wins
            nifti.save(nifti.NiftiImage(data=liver, affine=affine),
                       str(segs / "liver.nii.gz"))
            nifti.save(nifti.NiftiImage(data=spleen, affine=affine),
                       str(segs / "spleen.nii.gz"))
        return str(root)

    def test_flat_file_discovery_and_read(self, liver_raw):
        from waveformer_tpu.data.preprocessing import CTPreprocessor

        pp = CTPreprocessor(base_dir=liver_raw, foreground_classes=(1, 2))
        assert pp.get_iterable_list() == ["0", "1", "2"]
        data, seg, props = pp.read_data("0")
        assert data.shape == (1, 20, 32, 30)  # (C, Z, Y, X) transposed
        assert seg.shape == (1, 20, 32, 30)
        assert props["spacing"] == pytest.approx([2.5, 0.8, 0.8])
        assert set(np.unique(seg)) == {0, 1, 2}

    def test_flat_file_ct_run(self, liver_raw, tmp_path):
        from waveformer_tpu.data.preprocessing import CTPreprocessor

        pp = CTPreprocessor(base_dir=liver_raw, foreground_classes=(1, 2),
                            out_spacing=(2.5, 0.8, 0.8))
        plan = pp.run_plan()
        assert plan["n_cases_fingerprinted"] == 3
        props = plan["intensities_per_channel"][0]
        out = str(tmp_path / "fullres")
        done = pp.run(out, num_processes=1, intensity_props={0: props})
        assert len(done) == 3
        img = np.load(os.path.join(out, "0.npz"))["data"]
        # CT normalization: clipped to fingerprint percentiles then z-scored
        lo = (props["percentile_00_5"] - props["mean"]) / props["std"]
        hi = (props["percentile_99_5"] - props["mean"]) / props["std"]
        assert img.min() >= lo - 1e-4 and img.max() <= hi + 1e-4

    def test_organ_mask_combination(self, atlas_raw):
        from waveformer_tpu.data.preprocessing import OrganMaskPreprocessor

        pp = OrganMaskPreprocessor(
            base_dir=atlas_raw,
            seg_list=("liver.nii.gz", "spleen.nii.gz"),
        )
        assert pp.get_iterable_list() == ["BDMAP_00000001", "BDMAP_00000002"]
        assert pp.foreground_classes == (1, 2)
        data, seg, props = pp.read_data("BDMAP_00000001")
        assert data.shape == (1, 16, 28, 28)
        assert set(np.unique(seg)) == {0, 1, 2}
        # overlap voxels: later mask overwrites (`segs[seg_arr == 1] = index`)
        assert seg[0, 7, 12, 12] == 2

    def test_organ_mask_run(self, atlas_raw, tmp_path):
        from waveformer_tpu.data.preprocessing import OrganMaskPreprocessor

        pp = OrganMaskPreprocessor(
            base_dir=atlas_raw,
            seg_list=("liver.nii.gz", "spleen.nii.gz"),
            out_spacing=(3.0, 1.0, 1.0),
        )
        plan = pp.run_plan()
        props = plan["intensities_per_channel"][0]
        out = str(tmp_path / "fullres")
        done = pp.run(out, num_processes=1, intensity_props={0: props})
        assert len(done) == 2
        seg = np.load(os.path.join(out, "BDMAP_00000001.npz"))["seg"]
        labels = set(np.unique(seg).astype(int))
        assert {1, 2} <= labels

    def test_preprocess_cli_ct(self, liver_raw, tmp_path):
        from waveformer_tpu.scripts.preprocess import main

        out = str(tmp_path / "out")
        main(["--raw-dir", liver_raw, "--out-dir", out,
              "--dataset-type", "ct", "--num-processes", "1",
              "--foreground-classes", "1", "2"])
        assert os.path.exists(os.path.join(out, "plans.json"))
        assert os.path.exists(os.path.join(out, "0.npz"))

    def test_preprocess_cli_ct_organs(self, atlas_raw, tmp_path):
        from waveformer_tpu.scripts.preprocess import main

        out = str(tmp_path / "out")
        main(["--raw-dir", atlas_raw, "--out-dir", out,
              "--dataset-type", "ct-organs", "--num-processes", "1",
              "--organ-list", "liver.nii.gz", "spleen.nii.gz"])
        assert os.path.exists(os.path.join(out, "BDMAP_00000001.npz"))


class TestGlobalContextPreprocessor:
    """BraTS23-global round trip (`preprocessor_brats23_global.py:171-307`):
    preprocess emits data_global/seg_global alongside the standard
    artifacts; GlobalContextDataset reads them back precomputed; the
    context channel feeds a train step."""

    def _write_raw_case(self, case_dir, rng):
        import os

        from waveformer_tpu.utils import nifti

        os.makedirs(case_dir, exist_ok=True)
        shape = (30, 28, 26)  # (X, Y, Z) on disk
        affine = np.diag([1.0, 1.0, 2.0, 1.0]).astype(np.float32)
        for fname in ("t2w.nii.gz", "t2f.nii.gz"):
            vol = np.zeros(shape, np.float32)
            vol[4:26, 4:24, 4:22] = 80 + 30 * rng.standard_normal((22, 20, 18))
            nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                       os.path.join(case_dir, fname))
        seg = np.zeros(shape, np.float32)
        seg[8:18, 8:18, 6:14] = 1
        seg[10:14, 10:14, 8:12] = 3
        nifti.save(nifti.NiftiImage(data=seg, affine=affine),
                   os.path.join(case_dir, "seg.nii.gz"))

    def test_roundtrip_preprocess_load_train_step(self, tmp_path):
        import os

        import jax
        import jax.numpy as jnp

        from waveformer_tpu.data.dataset import MedicalDataset, unpack_dataset
        from waveformer_tpu.data.dataset_variants import GlobalContextDataset
        from waveformer_tpu.data.preprocessing import (
            GlobalContextPreprocessor,
        )

        rng = np.random.default_rng(0)
        raw = tmp_path / "raw" / "images"
        for name in ("case_000", "case_001"):
            self._write_raw_case(str(raw / name), rng)

        prep = GlobalContextPreprocessor(
            base_dir=str(tmp_path / "raw"),
            image_dir="images",
            data_filenames=("t2w.nii.gz", "t2f.nii.gz"),
            seg_filename="seg.nii.gz",
            global_size=(12, 12, 12),
        )
        out_dir = str(tmp_path / "pre")
        for case in prep.get_iterable_list():
            prep.run_case_save(case, out_dir)

        # artifact: one npz holding data + seg + the global pair
        with np.load(os.path.join(out_dir, "case_000.npz")) as z:
            assert set(z.files) >= {"data", "seg", "data_global", "seg_global"}
            dg, sg = z["data_global"], z["seg_global"]
        assert dg.shape == (2, 12, 12, 12) and dg.dtype == np.float32
        assert sg.shape == (1, 12, 12, 12)
        assert set(np.unique(sg)) <= {0, 1, 3}  # label-safe seg downsample

        # loader: precomputed context comes back without recomputation,
        # both packed (npz) and unpacked (memmap) — and matches the artifact
        for unpack in (False, True):
            if unpack:
                unpack_dataset(out_dir, num_processes=1)
            base = MedicalDataset(
                out_dir, ["case_000", "case_001"], unpack=False,
            )
            ds = GlobalContextDataset(base, global_shape=(999, 999, 999))
            item = ds["case_000"]
            # shape proves the stored artifact was used, not the on-the-fly
            # fallback (which would produce the bogus 999-shape)
            assert item["data_global"].shape == (2, 12, 12, 12)
            np.testing.assert_allclose(
                np.asarray(item["data_global"]), dg, rtol=1e-6
            )

        # train step consuming the context channel: tiny dual-input model
        import flax.linen as nn

        class TinyGlobalNet(nn.Module):
            @nn.compact
            def __call__(self, patch, ctx):
                # ctx (B, C, 12, 12, 12) → pooled embedding, broadcast-add
                c = jnp.mean(ctx, axis=(2, 3, 4))  # (B, C)
                h = nn.Conv(4, (3, 3, 3), padding="SAME")(patch)
                return h + nn.Dense(4)(c)[:, None, None, None, :]

        model = TinyGlobalNet()
        patch = jnp.asarray(
            np.asarray(item["data"][:, :8, :8, :8], np.float32)
        ).transpose(1, 2, 3, 0)[None]
        ctx = jnp.asarray(np.asarray(item["data_global"], np.float32))[None]
        params = model.init(jax.random.PRNGKey(0), patch, ctx)
        seg_patch = jnp.asarray(
            np.asarray(item["seg"][0, :8, :8, :8], np.int32)
        )[None, ..., None]

        def loss_fn(p):
            logits = model.apply(p, patch, ctx)
            onehot = jax.nn.one_hot(seg_patch[..., 0], 4)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_cli_builds_global_driver(self):
        from waveformer_tpu.scripts.preprocess import build_preprocessor

        import argparse

        args = argparse.Namespace(
            dataset_type="mri-global",
            modalities=["t2w.nii.gz", "t2f.nii.gz"],
            seg_filename="seg.nii.gz",
            global_size=[64, 64, 64],
        )
        prep = build_preprocessor(args, "/data/raw/images")
        from waveformer_tpu.data.preprocessing import (
            GlobalContextPreprocessor,
        )

        assert isinstance(prep, GlobalContextPreprocessor)
        assert prep.global_size == (64, 64, 64)
