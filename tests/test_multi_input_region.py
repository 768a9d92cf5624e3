"""Multi-input + region-training driver (reference
`preprocessor_multiinput_and_region.py:32-208` capability): N separate input
images per case, per-channel CT normalization, REGION-format foreground
sampling, composed with the patch sampler and the sigmoid DC+BCE region loss.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.data import MultiInputRegionPreprocessor, PatchSampler
from waveformer_tpu.data.preprocessing import (
    sample_foreground_locations_regions,
)
from waveformer_tpu.training.losses import dice_bce_loss
from waveformer_tpu.utils import nifti

REGIONS = ((1, 2), (2,))  # "whole lesion" ⊇ "core" (overlapping regions)


def _write_case(case_dir, rng, with_seg=True):
    os.makedirs(case_dir, exist_ok=True)
    shape = (28, 26, 24)  # (X, Y, Z) frame on disk
    affine = np.diag([1.0, 1.0, 2.5, 1.0]).astype(np.float32)
    for fname in ("ct.nii.gz", "pet.nii.gz"):
        vol = np.zeros(shape, np.float32)
        vol[4:24, 4:22, 4:20] = 100 + 40 * rng.standard_normal((20, 18, 16))
        nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                   os.path.join(case_dir, fname))
    if with_seg:
        seg = np.zeros(shape, np.float32)
        seg[8:16, 8:16, 6:14] = 1
        seg[10:14, 10:14, 8:12] = 2
        nifti.save(nifti.NiftiImage(data=seg, affine=affine),
                   os.path.join(case_dir, "seg.nii.gz"))


def test_region_location_sampling():
    seg = np.zeros((1, 8, 8, 8), np.int8)
    seg[0, 2:6, 2:6, 2:6] = 1
    seg[0, 3:5, 3:5, 3:5] = 2
    locs = sample_foreground_locations_regions(seg, REGIONS, seed=0)
    assert set(locs) == {(1, 2), 2}
    # every sampled coordinate lies inside its region
    for coord in locs[(1, 2)]:
        assert seg[tuple(coord)] in (1, 2)
    for coord in locs[2]:
        assert seg[tuple(coord)] == 2
    # scalar region == plain class key
    locs2 = sample_foreground_locations_regions(seg, (1, 2), seed=0)
    assert set(locs2) == {1, 2}


def test_multi_input_region_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    base = tmp_path / "raw"
    for name in ("case_000", "case_001"):
        _write_case(str(base / name), rng)

    ct_props = {
        "mean": 100.0, "std": 40.0,
        "percentile_00_5": -50.0, "percentile_99_5": 300.0,
    }
    prep = MultiInputRegionPreprocessor(
        base_dir=str(base),
        data_filenames=("ct.nii.gz", "pet.nii.gz"),
        seg_filename="seg.nii.gz",
        regions=REGIONS,
        out_spacing=(1.0, 1.0, 1.0),
    )
    assert prep.get_iterable_list() == ["case_000", "case_001"]

    out_dir = str(tmp_path / "pre")
    intensity = {0: ct_props, 1: ct_props}
    for case in prep.get_iterable_list():
        prep.run_case_save(case, out_dir, intensity)

    with np.load(os.path.join(out_dir, "case_000.npz")) as z:
        data, seg = z["data"], z["seg"]
    assert data.shape[0] == 2  # two separate inputs stacked as channels
    with open(os.path.join(out_dir, "case_000.pkl"), "rb") as f:
        props = pickle.load(f)
    locs = props["class_locations"]
    assert set(locs) == {(1, 2), 2} and len(locs[(1, 2)]) > 0

    # the patch sampler consumes region keys like any class key
    sampler = PatchSampler(
        dataset=None, patch_size=(16, 16, 16),
        oversample_foreground_percent=1.0, seed=3,
    )
    lbs, ubs = sampler.get_bbox(data.shape[1:], True, locs)
    d, s = sampler.crop_patch(data, seg, lbs, ubs)
    assert d.shape == (2, 16, 16, 16)
    assert np.isin(s, [1, 2]).any()  # forced-fg patch contains the region

    # region loss: one-hot overlapping region targets, channels-last
    target = np.stack(
        [np.isin(s[0], r).astype(np.float32) for r in REGIONS], axis=-1
    )[None]
    logits = jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, len(REGIONS))), jnp.float32
    )
    loss = dice_bce_loss(logits, jnp.asarray(target))
    assert np.isfinite(float(loss))
    # near-perfect logits score (much) better than random ones
    good = dice_bce_loss(jnp.asarray(target) * 20 - 10, jnp.asarray(target))
    assert float(good) < float(loss)
    # and the loss is differentiable end to end
    g = jax.grad(lambda lg: dice_bce_loss(lg, jnp.asarray(target)))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_cli_builds_multi_input_driver():
    """`wtpu-preprocess --dataset-type multi-input` constructs the region
    driver with parsed region groups (the CLI surface of this variant)."""
    import argparse

    from waveformer_tpu.scripts.preprocess import build_preprocessor

    ns = argparse.Namespace(
        dataset_type="multi-input",
        modalities=["ct.nii.gz", "pet.nii.gz"],
        seg_filename="seg.nii.gz",
        regions=["1,2", "2"],
    )
    prep = build_preprocessor(ns, "/data/raw/images")
    assert isinstance(prep, MultiInputRegionPreprocessor)
    assert prep.regions == REGIONS
    assert prep.data_filenames == ("ct.nii.gz", "pet.nii.gz")
    assert prep.normalization == "ct"
