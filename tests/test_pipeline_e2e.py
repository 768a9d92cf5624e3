"""End-to-end pipeline composition test: the five CLIs chained on a
synthetic BraTS-style mini-dataset, exactly the flow the reference README
documents (`README.md:32-76`):

    1_rename → 2_preprocess → 3_train → 4_predict → 5_compute_metrics

Asserts the metrics artifact shape/finiteness and that the model actually
learned the (easy) synthetic target (WT dice > 0.5)."""

import os

import numpy as np
import pytest

MODALITIES = ("t2w", "t2f", "t1n", "t1c")


@pytest.fixture(scope="module")
def brats_raw(tmp_path_factory):
    """5 synthetic BraTS2023-named cases with a strong, learnable target:
    label 1 (NCR) blob and an inner label 3 (ET) core, both with big
    intensity offsets in every modality."""
    from waveformer_tpu.utils import nifti

    root = tmp_path_factory.mktemp("brats_raw")
    rng = np.random.default_rng(7)
    affine = np.eye(4, dtype=np.float32)
    for i in range(5):
        name = f"BraTS-GLI-{i:05d}-000"
        case = root / name
        os.makedirs(case)
        shape = (44, 44, 36)
        cx, cy, cz = (
            20 + rng.integers(-3, 4),
            20 + rng.integers(-3, 4),
            17 + rng.integers(-3, 4),
        )
        xs, ys, zs = np.ogrid[: shape[0], : shape[1], : shape[2]]
        r2 = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        tumor = r2 < 9**2
        core = r2 < 4**2
        seg = np.zeros(shape, np.int8)
        seg[tumor] = 1
        seg[core] = 3
        for mod in MODALITIES:
            vol = rng.standard_normal(shape).astype(np.float32)
            vol[tumor] += 4.0
            vol[core] += 4.0
            nifti.save(
                nifti.NiftiImage(data=vol, affine=affine),
                str(case / f"{name}-{mod}.nii.gz"),
            )
        nifti.save(
            nifti.NiftiImage(data=seg, affine=affine),
            str(case / f"{name}-seg.nii.gz"),
        )
    return str(root)


@pytest.mark.slow
def test_five_step_pipeline(brats_raw, tmp_path):
    work = tmp_path

    # ---- step 1: rename ------------------------------------------------ #
    from waveformer_tpu.scripts.rename_data import main as rename_main

    rename_main([brats_raw])
    case0 = os.path.join(brats_raw, sorted(os.listdir(brats_raw))[0])
    assert "seg.nii.gz" in os.listdir(case0)

    # ---- step 2: preprocess -------------------------------------------- #
    from waveformer_tpu.scripts.preprocess import main as preprocess_main

    fullres = str(work / "fullres")
    preprocess_main([
        "--raw-dir", brats_raw, "--out-dir", fullres,
        "--modalities", *[m + ".nii.gz" for m in MODALITIES],
        "--num-processes", "1",
    ])
    assert os.path.exists(os.path.join(fullres, "plans.json"))
    npzs = [f for f in os.listdir(fullres) if f.endswith(".npz")]
    assert len(npzs) == 5

    # ---- config shared by steps 3-5 ------------------------------------ #
    config_path = str(work / "config.yaml")
    with open(config_path, "w") as f:
        f.write(f"""\
data_dir: "{fullres}"
logdir: "{work}/logs/"
raw_data_dir: "{brats_raw}"
model_name: "e2e_test"
data_list_path: "{work}/data_list"
split_path: "default_split"
max_epoch: 2
batch_size: 2
val_every: 1
num_steps_per_epoch: 30
val_patches_per_epoch: 4
roi_size: [32, 32, 32]
train_process: 2
seed: 42
lr: 0.002
scheduler: "warmup_cosine"
warmup_epochs: 0.5
compute_dtype: "float32"
label_mode: "brats"
prediction:
  patch_size: [32, 32, 32]
  sw_batch_size: 4
  overlap: 0.25
  mirror_axes: [0, 1, 2]
  raw_spacing: [1.0, 1.0, 1.0]
  prediction_save: "{work}/predictions"
network:
  model_type: "Waveformer"
  in_channels: 4
  out_channels: 4
  img_size: [32, 32, 32]
  patch_size: 2
  transformer:
    embed_dims: [8, 16, 32, 64]
    depths: [1, 1, 1, 1]
    num_heads: [2, 4, 8, 8]
    decom_levels: [3, 2, 1, 0]
    multi_scale_attention: true
    drop_path_rate: 0.0
logging:
  log_file: "{work}/logs/e2e.log"
""")

    # ---- step 3: train -------------------------------------------------- #
    from waveformer_tpu.scripts.train import main as train_main

    train_main(["--config", config_path, "--platform", "cpu"])
    model_dir = os.path.join(str(work), "logs", "model")
    assert any(f.startswith("best_model") for f in os.listdir(model_dir))

    # ---- step 4: predict (validation split; no test list) --------------- #
    from waveformer_tpu.scripts.predict import main as predict_main

    predict_main([
        "--config", config_path, "--split", "val", "--no-tta",
        "--platform", "cpu",
    ])
    preds = os.listdir(str(work / "predictions"))
    assert len(preds) == 1 and preds[0].endswith(".nii.gz")

    # ---- step 5: metrics ------------------------------------------------ #
    from waveformer_tpu.scripts.compute_metrics import main as metrics_main

    out_npy = str(work / "result_metrics.npy")
    metrics_main([
        "--config", config_path, "--split", "val", "--out", out_npy,
    ])
    results = np.load(out_npy)
    assert results.shape == (1, 3, 2)  # (cases, TC/WT/ET, dice+hd95)
    assert np.isfinite(results).all()
    # 60 toy steps on CPU reach ~0.4-0.6 WT dice; random init scores ~0.0 —
    # 0.3 is the "actually learned" bar that keeps the test fast and stable.
    wt_dice = results[0, 1, 0]
    assert wt_dice > 0.3, f"model failed to learn synthetic target: {wt_dice}"
