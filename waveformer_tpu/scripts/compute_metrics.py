"""Step 5 — per-case Dice + HD95 on saved predictions vs raw ground truth
(reference `5_compute_metrics.py`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from waveformer_tpu.config import load_config
from waveformer_tpu.data.dataset import get_train_val_test_loader_from_train
from waveformer_tpu.metrics import brats_case_metrics, multiclass_case_metrics
from waveformer_tpu.utils import nifti


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--pred-dir", default=None)
    ap.add_argument("--gt-dir", default=None,
                    help="raw dataset root containing {case}/seg.nii.gz")
    ap.add_argument("--split", choices=("test", "val"), default="test")
    ap.add_argument("--out", default="result_metrics.npy")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    pred_dir = args.pred_dir or cfg.prediction.prediction_save
    gt_dir = args.gt_dir or cfg.raw_data_dir
    label_mode = cfg.extra.get("label_mode", "brats")

    _, val_ds, test_ds = get_train_val_test_loader_from_train(
        cfg.data_dir,
        test_list_path=os.path.join(cfg.data_list_path, "test_list.pkl"),
        split_dir=os.path.join(cfg.data_list_path, cfg.split_path),
        unpack=False,
    )
    names = (test_ds if args.split == "test" else val_ds).case_names
    n_rows = 3 if label_mode == "brats" else cfg.network.out_channels - 1
    results = np.zeros((len(names), n_rows, 2), np.float64)
    for i, name in enumerate(names):
        gt = nifti.load(os.path.join(gt_dir, name, "seg.nii.gz")).data.T
        pred = nifti.load(os.path.join(pred_dir, name + ".nii.gz")).data.T
        if label_mode == "brats":
            results[i] = brats_case_metrics(
                gt, pred, cfg.prediction.raw_spacing
            )
        else:
            results[i] = multiclass_case_metrics(
                gt, pred, cfg.network.out_channels, cfg.prediction.raw_spacing
            )
        print(name, results[i].tolist())

    np.save(args.out, results)
    mean, std = results.mean(axis=0), results.std(axis=0)
    class_names = (
        ("TC", "WT", "ET") if label_mode == "brats"
        else tuple(f"class{c}" for c in range(1, n_rows + 1))
    )
    for c, cls in enumerate(class_names):
        print(
            f"{cls}: dice {mean[c, 0]:.4f}±{std[c, 0]:.4f} "
            f"hd95 {mean[c, 1]:.2f}±{std[c, 1]:.2f}"
        )
    print(
        f"AVG: dice {results[:, :, 0].mean():.4f} "
        f"hd95 {results[:, :, 1].mean():.2f}"
    )


if __name__ == "__main__":
    main()
