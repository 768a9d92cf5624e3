"""Benchmark entry point — prints ONE JSON line.

Headline metric (BASELINE.json): BraTS2023 full-case sliding-window
inference throughput, cases/sec/chip — the reference protocol end-to-end on
one chip: 128³ ROI, overlap 0.5, Gaussian blending, 8-way mirror TTA
(`4_predict.py:199-211`), bf16 WaveFormer at the flagship config, on a
typical post-crop BraTS case shape (bucketed to 192³).

Baseline anchor: the strongest published single-GPU transformer-core rate on
this workload, 1.92 cases/s (large-kernel conv core; Swin core 1.68 —
BASELINE.md), measured WITHOUT TTA on an A100. We report the 8×-TTA number
(the reference's actual inference protocol), so vs_baseline is conservative.
"""

import json
import time

import numpy as np


def main():
    import os

    # persistent XLA compilation cache: the TTA program compiles in minutes
    # the first time and loads in seconds afterwards
    cache = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from waveformer_tpu.config import Config
    from waveformer_tpu.inference import Predictor, SlidingWindowInferer
    from waveformer_tpu.models import create_waveformer

    cfg = Config()
    # channels-first I/O end to end: preprocessed data is (C, D, H, W)
    # already, and the cf model + cf stitch avoid every small-C-minor
    # tensor (measured ~8% faster than channels-last on v5e)
    model = create_waveformer(
        cfg.network.model_kwargs(), dtype=jnp.bfloat16,
        io_layout="channels_first",
    )
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 4, 128, 128, 128), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    predict = lambda patches: model.apply(params, patches)

    inferer = SlidingWindowInferer(
        roi_size=(128, 128, 128),
        sw_batch_size=8,  # sweet spot on v5e: whole 192³-bucket grid in one chunk
        overlap=0.5,
        mirror_axes=(0, 1, 2),
        layout="channels_first",
        tta_mode="patch",  # stitch once, orientations folded into the patch predictor: 4.14 vs 4.30 s/case (see BENCH_NOTES.md)
    )
    predictor = Predictor(inferer, upload_dtype=jnp.bfloat16)

    # typical post-crop BraTS case shape; bucket = 192³
    shape = (4, 150, 180, 145)
    warm = rng.standard_normal(shape).astype(np.float32)
    seg = predictor.predict_case(warm, predict, out_channels=4)  # compile
    assert seg.shape == shape[1:]

    # pipelined multi-case stream: case i+1's upload/dispatch overlaps case
    # i's device compute (the production serving path; per-case latency is
    # the predict_case path measured in BENCH_NOTES.md)
    def stream_rate(vols):
        t0 = time.time()
        for i, seg in enumerate(predictor.predict_cases(vols, predict, out_channels=4)):
            assert seg.shape == vols[i].shape[1:]
        return len(vols) / (time.time() - t0)

    n_cases = 4
    vols = [
        rng.standard_normal(shape).astype(np.float32) for _ in range(n_cases)
    ]
    # 3 streams: the first after compile pays one-off dispatch/link warmup
    # over the tunneled device (~8% observed); the headline is the MEAN of
    # the two warm streams (steady serving throughput), not a max.
    rates = [stream_rate(vols) for _ in range(3)]
    cases_per_s = (rates[1] + rates[2]) / 2.0

    # HEADLINE FIRST. Round 4's driver run timed out (rc=124, no number
    # captured) because a second-bucket measurement compiled a fresh stitch
    # program after the warm streams but before the print. Nothing that can
    # compile or spend unbounded time may precede this line.
    baseline = 1.92  # cases/s, BASELINE.md (no-TTA A100 anchor)
    print(
        json.dumps(
            {
                "metric": "brats_fullcase_sliding_window_inference",
                "value": round(cases_per_s, 4),
                "unit": "cases/sec/chip (128^3 roi, overlap 0.5, 8x mirror TTA, bf16)",
                "vs_baseline": round(cases_per_s / baseline, 4),
                "streams": [round(r, 4) for r in rates],
            }
        ),
        flush=True,
    )

    # Optional second bucket (WFTPU_BENCH_EXTRA=1): real post-crop BraTS
    # shapes span buckets — (4,120,160,126) pads to (128,192,128) (2 patch
    # positions instead of 8) and pays its own stitch-program compile,
    # exposing per-bucket variance the 192^3 headline shape would hide.
    # Gated off by default so the driver run stays inside its budget.
    if os.environ.get("WFTPU_BENCH_EXTRA"):
        shape2 = (4, 120, 160, 126)
        vols2 = [
            rng.standard_normal(shape2).astype(np.float32)
            for _ in range(n_cases)
        ]
        stream_rate(vols2)  # compile + warmup
        bucket2_rate = stream_rate(vols2)
        print(
            json.dumps(
                {
                    "metric": "bucket_128x192x128_cases_per_s",
                    "value": round(bucket2_rate, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
