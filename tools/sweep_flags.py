"""Sweep the perf A/B env flags over the full flagship model forward.

Run on the real TPU:  python tools/sweep_flags.py [--batch 8] [--iters 32]

Each configuration builds a fresh jitted forward (the flags are read at
trace time), so one process measures every combination back-to-back with
the same params/input.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    path = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


SWEEP = [
    # (label, paired, pallas_dwconv, no_batch_scan, unroll_batch)
    # Measured (2026-08-18, flagship fwd B=8, iters 32, ms/patch):
    #   baseline 58.64 | paired 67.7 | dwconv only 60.84 (VMEM-gated to
    #   the 32³/16³/8³ FFN shapes after the C=192 scoped-OOM fix).
    # paired+ combos and folded combos dropped: paired loses outright and
    # unpaired folded convs measured 2× slower standalone (common.py).
    ("baseline (r3 shipped)", "0", "0", "0", "0"),
    ("unroll batch", "0", "0", "0", "1"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    _cache()

    from waveformer_tpu.config import Config
    from waveformer_tpu.models import create_waveformer
    from waveformer_tpu.utils.profiling import device_time

    cfg = Config()
    model = create_waveformer(
        cfg.network.model_kwargs(), dtype=jnp.bfloat16,
        io_layout="channels_first",
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 4, 128, 128, 128)
        ),
        jnp.bfloat16,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 128, 128, 128), jnp.float32)
    )

    ref_out = None
    for label, paired, dwconv, fold, unroll in SWEEP:
        os.environ["WFTPU_PAIRED_CONV"] = paired
        os.environ["WFTPU_PALLAS_DWCONV"] = dwconv
        os.environ["WFTPU_NO_BATCH_SCAN"] = fold
        os.environ["WFTPU_UNROLL_BATCH"] = unroll
        fwd = jax.jit(lambda v: model.apply(params, v))
        out = np.asarray(fwd(x), np.float32)
        if ref_out is None:
            ref_out = out
        err = float(np.max(np.abs(out - ref_out)))
        ms = device_time(fwd, x, iters=args.iters) * 1e3
        print(
            f"{label:28s} {ms:8.2f} ms  ({ms/args.batch:6.2f} /patch)"
            f"  max|diff|={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
