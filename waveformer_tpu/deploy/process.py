"""Containerized inference harness (grand-challenge style).

Capability match for the reference's `Customalgorithm`
(`light_training/process_framework/process.py:8`): reads raw volumes from an
input directory, runs the full preprocess → sliding-window TTA → geometry
restore pipeline, writes segmentations to an output directory. Designed for
/input → /output container conventions but path-configurable.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Sequence


class InferenceAlgorithm:
    """End-to-end single-case algorithm wrapper."""

    def __init__(
        self,
        checkpoint: str,
        config_path: Optional[str] = None,
        input_dir: str = "/input",
        output_dir: str = "/output",
        modalities: Sequence[str] = ("t2w.nii.gz", "t2f.nii.gz",
                                     "t1n.nii.gz", "t1c.nii.gz"),
        use_tta: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from waveformer_tpu.config import Config, load_config
        from waveformer_tpu.inference import Predictor, SlidingWindowInferer
        from waveformer_tpu.models import create_waveformer
        from waveformer_tpu.training.checkpoint import load_params_npz

        self.cfg = (
            load_config(config_path)
            if config_path and os.path.exists(config_path)
            else Config()
        )
        self.input_dir = input_dir
        self.output_dir = output_dir
        self.modalities = tuple(modalities)

        dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        self.model = create_waveformer(
            self.cfg.network.model_kwargs(), dtype=dtype,
            io_layout="channels_first",
        )
        params = load_params_npz(checkpoint)
        self.params = jax.tree.map(jnp.asarray, params)
        self.predict_fn = lambda patches: self.model.apply(self.params, patches)
        inferer = SlidingWindowInferer(
            roi_size=self.cfg.prediction.patch_size,
            sw_batch_size=self.cfg.prediction.sw_batch_size,
            overlap=self.cfg.prediction.overlap,
            mirror_axes=self.cfg.prediction.mirror_axes if use_tta else None,
            layout="channels_first",
            tta_mode="patch",
        )
        self.predictor = Predictor(inferer, upload_dtype=dtype)

        from waveformer_tpu.data.preprocessing import MultiModalityPreprocessor

        self.preprocessor = MultiModalityPreprocessor(
            base_dir=os.path.dirname(input_dir.rstrip("/")) or "/",
            image_dir=os.path.basename(input_dir.rstrip("/")),
            data_filenames=self.modalities,
            seg_filename=None,
        )

    def process_case(self, case_name: str) -> str:
        data, _, props = self.preprocessor.read_data(case_name)
        data, _, props = self.preprocessor.run_case_npy(data, None, props)
        seg = self.predictor.predict_case(
            data,  # already (C, D, H, W) — the cf pipeline's native layout
            self.predict_fn,
            out_channels=self.cfg.network.out_channels,
            properties=props,
        )
        os.makedirs(self.output_dir, exist_ok=True)
        out_path = os.path.join(self.output_dir, case_name + ".nii.gz")
        self.predictor.save_to_nii(
            seg, out_path, spacing=props.get("spacing", (1, 1, 1)),
            properties=props,  # write back in the SOURCE voxel geometry
        )
        return out_path

    def process(self) -> int:
        cases = sorted(
            d for d in os.listdir(self.input_dir)
            if os.path.isdir(os.path.join(self.input_dir, d))
        )
        for case in cases:
            t0 = time.time()
            path = self.process_case(case)
            print(f"{case}: {path} ({time.time() - t0:.1f}s)", flush=True)
        return len(cases)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--input-dir", default="/input")
    ap.add_argument("--output-dir", default="/output")
    ap.add_argument("--modalities", nargs="+",
                    default=["t2w.nii.gz", "t2f.nii.gz", "t1n.nii.gz",
                             "t1c.nii.gz"])
    ap.add_argument("--no-tta", action="store_true")
    args = ap.parse_args(argv)
    algo = InferenceAlgorithm(
        checkpoint=args.checkpoint,
        config_path=args.config,
        input_dir=args.input_dir,
        output_dir=args.output_dir,
        modalities=args.modalities,
        use_tta=not args.no_tta,
    )
    n = algo.process()
    print(f"processed {n} cases")


if __name__ == "__main__":
    main()
