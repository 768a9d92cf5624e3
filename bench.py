"""Benchmark entry point — prints ONE JSON line.

Current metric (round 1): flagship WaveFormer 128³ patch inference throughput
on one chip, bf16, device-resident (no host transfers inside the timed loop).
Baseline anchor: the SegMamba ablation's strongest published single-GPU
transformer-core inference rate on the same 128³ workload, 1.92 cases/s
(BASELINE.md "large-kernel conv"; the Swin core is 1.68). One sliding-window
case ≈ several patches, so this is a patch-level proxy until the on-device
sliding-window engine lands (then this switches to cases/sec/chip).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from waveformer_tpu.config import Config
    from waveformer_tpu.models import create_waveformer

    batch = 1
    n_iter = 12
    cfg = Config()
    model = create_waveformer(cfg.network.model_kwargs(), dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 128, 128, 128, 4)),
        jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def many(p, v, n=n_iter):
        def body(c, _):
            y = model.apply(p, v + c * 1e-6)
            return c + 1.0, jnp.abs(y.astype(jnp.float32)).mean()

        _, ys = jax.lax.scan(body, 0.0, None, length=n)
        return ys.mean()

    many_j = jax.jit(many)
    check = float(many_j(params, x))  # compile + warmup; forces full sync
    assert np.isfinite(check), f"non-finite output {check}"

    t0 = time.time()
    check = float(many_j(params, x))
    dt = (time.time() - t0) / n_iter
    patches_per_s = batch / dt

    baseline_cases_per_s = 1.92  # BASELINE.md throughput context
    print(
        json.dumps(
            {
                "metric": "waveformer_128cubed_patch_inference_throughput",
                "value": round(patches_per_s, 3),
                "unit": "patches/sec/chip (bf16, batch=1, device-resident)",
                "vs_baseline": round(patches_per_s / baseline_cases_per_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
