"""Runnable abdominal-CT example: the full five-step pipeline on an
AbdomenAtlas-style dataset (per-case ``ct.nii.gz`` + per-organ binary
masks), end to end on synthetic data.

Capability match for the reference's runnable example drivers
(`light_training/examples/`) and its AbdomenAtlas preprocessor
(`default_preprocessor_AbdomenAtlas1_0Mini.py:235-272`): this script

1. synthesizes a small raw dataset (or uses ``--raw-dir`` if given),
2. plans + preprocesses it with ``OrganMaskPreprocessor`` (CT
   normalization from the dataset fingerprint),
3. trains a small Waveformer for a few epochs,
4. runs sliding-window prediction on the validation split,
5. computes per-organ Dice/HD95.

Run:  python examples/abdomen_ct/run_example.py --workdir /tmp/abdomen_demo
"""

from __future__ import annotations

import argparse
import os

import numpy as np


ORGANS = ("liver.nii.gz", "spleen.nii.gz")


def make_synthetic_dataset(raw_dir: str, n_cases: int, seed: int = 0) -> None:
    """AbdomenAtlas layout: {case}/ct.nii.gz + {case}/segmentations/{organ}.
    Also writes a combined {case}/seg.nii.gz for evaluation."""
    from waveformer_tpu.utils import nifti

    rng = np.random.default_rng(seed)
    affine = np.diag([1.5, 1.5, 3.0, 1.0]).astype(np.float32)
    for i in range(n_cases):
        case = os.path.join(raw_dir, f"BDMAP_{i:08d}")
        seg_dir = os.path.join(case, "segmentations")
        os.makedirs(seg_dir, exist_ok=True)
        shape = (48, 48, 32)  # (X, Y, Z)
        vol = rng.normal(0.0, 40.0, shape).astype(np.float32)

        def blob(cx, cy, cz, r):
            xs, ys, zs = np.ogrid[: shape[0], : shape[1], : shape[2]]
            return (
                ((xs - cx) / r) ** 2
                + ((ys - cy) / r) ** 2
                + ((zs - cz) / (r * 0.7)) ** 2
            ) < 1.0

        liver = blob(
            18 + rng.integers(-2, 3), 20 + rng.integers(-2, 3),
            14 + rng.integers(-2, 3), 10,
        )
        spleen = blob(
            34 + rng.integers(-2, 3), 30 + rng.integers(-2, 3),
            18 + rng.integers(-2, 3), 6,
        )
        vol[liver] += 120.0
        vol[spleen] += 220.0
        combined = np.zeros(shape, np.uint8)
        combined[liver] = 1
        combined[spleen] = 2
        nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                   os.path.join(case, "ct.nii.gz"))
        for organ, mask in (("liver.nii.gz", liver), ("spleen.nii.gz", spleen)):
            nifti.save(
                nifti.NiftiImage(data=mask.astype(np.uint8), affine=affine),
                os.path.join(seg_dir, organ),
            )
        nifti.save(nifti.NiftiImage(data=combined, affine=affine),
                   os.path.join(case, "seg.nii.gz"))


def write_config(workdir: str, raw_dir: str, epochs: int, steps: int = 40) -> str:
    cfg = f"""\
data_dir: "{workdir}/fullres"
logdir: "{workdir}/logs/"
raw_data_dir: "{raw_dir}"
model_name: "waveformer_abdomen_demo"
data_list_path: "{workdir}/data_list"
split_path: "default_split"
max_epoch: {epochs}
batch_size: 2
val_every: {max(1, epochs // 2)}
num_steps_per_epoch: {steps}
val_patches_per_epoch: 8
roi_size: [32, 32, 32]
train_process: 2
seed: 42
lr: 0.0008
scheduler: "warmup_cosine"
warmup_epochs: 1
compute_dtype: "float32"
label_mode: "multiclass"

prediction:
  patch_size: [32, 32, 32]
  sw_batch_size: 4
  overlap: 0.25
  mirror_axes: [0, 1, 2]
  raw_spacing: [1.0, 1.0, 1.0]
  prediction_save: "{workdir}/predictions"

network:
  model_type: "Waveformer"
  in_channels: 1
  out_channels: 3
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
  log_file: "{workdir}/logs/example.log"
"""
    path = os.path.join(workdir, "config.yaml")
    with open(path, "w") as f:
        f.write(cfg)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="./abdomen_demo")
    ap.add_argument("--raw-dir", default=None,
                    help="real AbdomenAtlas-style dataset (default: synthetic)")
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=40,
                    help="train steps per epoch (lower for smoke runs)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)

    raw_dir = args.raw_dir
    if raw_dir is None:
        raw_dir = os.path.join(workdir, "raw")
        if not os.path.isdir(raw_dir):
            print(f"[1/5] synthesizing {args.cases} cases -> {raw_dir}")
            make_synthetic_dataset(raw_dir, args.cases)
    else:
        print("[1/5] using existing raw dataset", raw_dir)

    from waveformer_tpu.scripts import preprocess

    print("[2/5] preprocessing (ct-organs driver, CT normalization)")
    preprocess.main([
        "--raw-dir", raw_dir,
        "--out-dir", os.path.join(workdir, "fullres"),
        "--dataset-type", "ct-organs",
        "--organ-list", *ORGANS,
        "--num-processes", "1",
    ])

    config_path = write_config(workdir, raw_dir, args.epochs, args.steps)
    platform = ["--platform", args.platform] if args.platform else []

    from waveformer_tpu.scripts import train

    print("[3/5] training")
    train.main(["--config", config_path, *platform])

    from waveformer_tpu.scripts import predict

    print("[4/5] predicting validation split")
    predict.main(["--config", config_path, "--split", "val",
                  "--no-tta", *platform])

    from waveformer_tpu.scripts import compute_metrics

    print("[5/5] computing metrics")
    compute_metrics.main([
        "--config", config_path, "--split", "val",
        "--out", os.path.join(workdir, "result_metrics.npy"),
    ])
    print("done; artifacts in", workdir)


if __name__ == "__main__":
    main()
