"""Step 2 — plan + preprocess the raw dataset (reference
`2_preprocessing_mri.py`): fingerprint, then crop/normalize/resample every
case to npz/pkl artifacts.
"""

from __future__ import annotations

import argparse
import json
import os

from waveformer_tpu.config import load_config
from waveformer_tpu.data.preprocessing import MultiModalityPreprocessor

BRATS_MODALITIES = ("t2w.nii.gz", "t2f.nii.gz", "t1n.nii.gz", "t1c.nii.gz")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--raw-dir", default=None, help="override raw_data_dir")
    ap.add_argument("--out-dir", default=None, help="override data_dir")
    ap.add_argument("--num-processes", type=int, default=8)
    ap.add_argument(
        "--modalities", nargs="+", default=list(BRATS_MODALITIES)
    )
    ap.add_argument("--seg-filename", default="seg.nii.gz")
    ap.add_argument("--plan-only", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if os.path.exists(args.config) else None
    raw_dir = args.raw_dir or (cfg.raw_data_dir if cfg else None)
    out_dir = args.out_dir or (cfg.data_dir if cfg else None)
    if not raw_dir or not out_dir:
        ap.error("--raw-dir/--out-dir required (or provide a config.yaml)")

    pp = MultiModalityPreprocessor(
        base_dir=os.path.dirname(raw_dir.rstrip("/")) or ".",
        image_dir=os.path.basename(raw_dir.rstrip("/")),
        data_filenames=tuple(args.modalities),
        seg_filename=args.seg_filename,
    )
    plan = pp.run_plan()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "plan.json"), "w") as f:
        json.dump(plan, f, indent=2)
    print(json.dumps(plan, indent=2))
    if args.plan_only:
        return
    done = pp.run(out_dir, num_processes=args.num_processes)
    print(f"preprocessed {len(done)} cases -> {out_dir}")


if __name__ == "__main__":
    main()
