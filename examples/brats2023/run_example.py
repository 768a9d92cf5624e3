"""Runnable BraTS2023 example: the flagship five-step pipeline at toy
scale, end to end on synthetic data.

Capability match for the reference's shipped pipeline order
(`README.md:32-76`: rename → preprocess → train → predict → metrics) on
its flagship dataset. This script

1. synthesizes a small BraTS-layout raw dataset (per-case directory with
   the four post-rename modality files + ``seg.nii.gz``; labels 1=NCR,
   2=ED, 3=ET) — or uses ``--raw-dir`` if given,
2. plans + preprocesses it with the multi-modality MRI driver
   (per-channel z-score, `preprocessor_mri.py` capability),
3. trains a small Waveformer with the BraTS TC/WT/ET region supervision,
4. runs sliding-window prediction on the validation split,
5. computes the (N, 3, 2) TC/WT/ET [Dice, HD95] array
   (`5_compute_metrics.py` protocol).

Run:  python examples/brats2023/run_example.py --workdir /tmp/brats_demo
For the real dataset, point --raw-dir at a renamed BraTS2023 tree
(``wtpu-rename``) and raise epochs/steps back to the shipped
``config.yaml`` values.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

MODALITIES = ("t2w.nii.gz", "t2f.nii.gz", "t1n.nii.gz", "t1c.nii.gz")


def make_synthetic_dataset(raw_dir: str, n_cases: int, seed: int = 0) -> None:
    """BraTS post-rename layout: {case}/{t2w,t2f,t1n,t1c,seg}.nii.gz."""
    from waveformer_tpu.utils import nifti

    rng = np.random.default_rng(seed)
    affine = np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)
    for i in range(n_cases):
        case = os.path.join(raw_dir, f"BraTS-GLI-{i:05d}-000")
        os.makedirs(case, exist_ok=True)
        shape = (48, 48, 40)  # (X, Y, Z)

        def blob(cx, cy, cz, r):
            xs, ys, zs = np.ogrid[: shape[0], : shape[1], : shape[2]]
            return (
                ((xs - cx) / r) ** 2
                + ((ys - cy) / r) ** 2
                + ((zs - cz) / r) ** 2
            ) < 1.0

        cx, cy, cz = (
            24 + rng.integers(-3, 4),
            24 + rng.integers(-3, 4),
            20 + rng.integers(-3, 4),
        )
        edema = blob(cx, cy, cz, 11)
        necrotic = blob(cx, cy, cz, 7)
        enhancing = blob(cx, cy, cz, 4)
        seg = np.zeros(shape, np.uint8)
        seg[edema] = 2
        seg[necrotic] = 1
        seg[enhancing] = 3
        brain = blob(24, 24, 20, 20)
        for m, fname in enumerate(MODALITIES):
            vol = np.zeros(shape, np.float32)
            vol[brain] = 600 + 150 * rng.standard_normal(int(brain.sum()))
            vol[edema] += 120 * (m + 1) / 4
            vol[enhancing] += 250 * (4 - m) / 4
            nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                       os.path.join(case, fname))
        nifti.save(nifti.NiftiImage(data=seg, affine=affine),
                   os.path.join(case, "seg.nii.gz"))


def write_config(workdir: str, raw_dir: str, epochs: int, steps: int = 40) -> str:
    cfg = f"""\
data_dir: "{workdir}/fullres"
logdir: "{workdir}/logs/"
raw_data_dir: "{raw_dir}"
model_name: "waveformer_brats_demo"
data_list_path: "{workdir}/data_list"
split_path: "default_split"
max_epoch: {epochs}
batch_size: 2
val_every: {max(1, epochs // 2)}
num_steps_per_epoch: {steps}
val_patches_per_epoch: 8
roi_size: [32, 32, 32]
train_process: 2
seed: 123
lr: 0.0008
scheduler: "warmup_cosine"
warmup_epochs: 1
compute_dtype: "float32"
label_mode: "brats"

prediction:
  patch_size: [32, 32, 32]
  sw_batch_size: 4
  overlap: 0.25
  mirror_axes: [0, 1, 2]
  raw_spacing: [1.0, 1.0, 1.0]
  prediction_save: "{workdir}/predictions"

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
  log_file: "{workdir}/logs/example.log"
"""
    path = os.path.join(workdir, "config.yaml")
    with open(path, "w") as f:
        f.write(cfg)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="./brats_demo")
    ap.add_argument("--raw-dir", default=None,
                    help="real renamed BraTS2023 tree (default: synthetic)")
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

    print("[2/5] preprocessing (multi-modality MRI driver, z-score)")
    preprocess.main([
        "--raw-dir", raw_dir,
        "--out-dir", os.path.join(workdir, "fullres"),
        "--dataset-type", "mri",
        "--modalities", *MODALITIES,
        "--num-processes", "1",
    ])

    config_path = write_config(workdir, raw_dir, args.epochs, args.steps)
    platform = ["--platform", args.platform] if args.platform else []

    from waveformer_tpu.scripts import train

    print("[3/5] training (TC/WT/ET region supervision)")
    train.main(["--config", config_path, *platform])

    from waveformer_tpu.scripts import predict

    print("[4/5] predicting validation split")
    predict.main(["--config", config_path, "--split", "val",
                  "--no-tta", *platform])

    from waveformer_tpu.scripts import compute_metrics

    print("[5/5] computing TC/WT/ET metrics")
    compute_metrics.main([
        "--config", config_path, "--split", "val",
        "--out", os.path.join(workdir, "result_metrics.npy"),
    ])
    print("done; artifacts in", workdir)


if __name__ == "__main__":
    main()
