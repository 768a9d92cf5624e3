"""Quantify the --tta protocol knob (VERDICT r4 #3).

Measures cases/s/chip at 1/2/4/8 mirror-TTA orientations with the exact
`bench.py` methodology (cf model, patch-mode TTA, pipelined 4-case stream,
mean of two warm streams), and prints the projected v5e-8 fleet time for
the 250-case BraTS2023 validation set under perfect case sharding
(`Predictor.predict_cases_sharded` measures ~linear — MULTICHIP_r04).

    python tools/bench_tta.py                 # all of 1,2,4,8
    python tools/bench_tta.py --tta 2 4       # subset

Reference protocol anchor: `light_training/prediction.py:110-160`
(8-way mirror TTA is the reference's shipped protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tta", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--cases", type=int, default=4)
    args = ap.parse_args()

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
    model = create_waveformer(
        cfg.network.model_kwargs(), dtype=jnp.bfloat16,
        io_layout="channels_first",
    )
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 4, 128, 128, 128), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    predict = lambda patches: model.apply(params, patches)

    shape = (4, 150, 180, 145)  # 192³ bucket, same as bench.py
    vols = [
        rng.standard_normal(shape).astype(np.float32)
        for _ in range(args.cases)
    ]

    AXES = {1: None, 2: (0,), 4: (0, 1), 8: (0, 1, 2)}
    for n_tta in args.tta:
        inferer = SlidingWindowInferer(
            roi_size=(128, 128, 128),
            sw_batch_size=8,
            overlap=0.5,
            mirror_axes=AXES[n_tta],
            layout="channels_first",
            tta_mode="patch",
        )
        predictor = Predictor(inferer, upload_dtype=jnp.bfloat16)

        def stream_rate():
            t0 = time.time()
            for i, seg in enumerate(
                predictor.predict_cases(vols, predict, out_channels=4)
            ):
                assert seg.shape == vols[i].shape[1:]
            return len(vols) / (time.time() - t0)

        t0 = time.time()
        predictor.predict_case(vols[0], predict, out_channels=4)  # compile
        compile_s = time.time() - t0
        rates = [stream_rate() for _ in range(3)]
        cps = (rates[1] + rates[2]) / 2.0
        fleet_s = 250.0 / (cps * 8)  # 250 cases, v5e-8, case-sharded
        print(
            json.dumps(
                {
                    "tta": n_tta,
                    "cases_per_s_chip": round(cps, 4),
                    "s_per_case": round(1.0 / cps, 3),
                    "streams": [round(r, 4) for r in rates],
                    "compile_or_cacheload_s": round(compile_s, 1),
                    "projected_v5e8_fleet_s_250cases": round(fleet_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
