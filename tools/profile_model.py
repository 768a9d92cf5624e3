"""Per-module device-time breakdown of the flagship Waveformer forward.

Run on the real TPU:  python tools/profile_model.py [--batch 8]

Measures each architectural piece standalone at its in-model shape (the
method behind the BENCH_NOTES.md accounting tables), plus the full model,
so `sum(pieces)` vs `model` exposes inter-op/copy overhead.
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    import os

    path = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()
    _cache()

    from waveformer_tpu.config import Config
    from waveformer_tpu.models import create_waveformer
    from waveformer_tpu.models.conv_blocks import (
        ChannelCalibration,
        UnetOutBlock,
        UnetrBasicBlock,
        UnetrUpBlock,
    )
    from waveformer_tpu.models.decoder import UnetrIDWTBlock
    from waveformer_tpu.models.layers import ProjectionUpsample
    from waveformer_tpu.models.waveformer import MultiscaleTransformer
    from waveformer_tpu.utils.profiling import device_time

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def timeit(name, module, *shapes, method=None):
        if args.only and args.only not in name:
            return
        xs = [
            jax.random.normal(jax.random.fold_in(key, i), s, dt)
            for i, s in enumerate(shapes)
        ]
        xs1 = [a[:1] for a in xs]
        params = module.init(jax.random.PRNGKey(1), *xs1)
        fn = jax.jit(lambda p, *a: module.apply(p, *a))
        ms = device_time(functools.partial(fn, params), *xs, iters=args.iters) * 1e3
        per_patch = ms / B
        print(f"{name:42s} {ms:8.2f} ms   {per_patch:6.2f} ms/patch", flush=True)
        return ms

    cfg = Config()
    fs = (48, 96, 192, 384)

    # full model (channels-first io like the inference path)
    model = create_waveformer(
        cfg.network.model_kwargs(), dtype=dt, io_layout="channels_first"
    )
    x0 = jnp.zeros((B, 4, 128, 128, 128), dt)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0[:1])
    fn = jax.jit(lambda p, a: model.apply(p, a))
    ms = device_time(functools.partial(fn, params), x0, iters=max(8, args.iters // 4)) * 1e3
    print(f"{'FULL MODEL (cf)':42s} {ms:8.2f} ms   {ms / B:6.2f} ms/patch", flush=True)

    # encoder
    enc = MultiscaleTransformer(dtype=dt, cf_in=True, drop_path_rate=0.1)
    timeit("encoder (4 stages)", enc, (B, 4, 128, 128, 128))

    # conv pieces at in-model shapes
    timeit("enc0 UnetrBasic 4->48 @128^3 (cf_in)",
           UnetrBasicBlock(fs[0], cf_in=True, dtype=dt), (B, 4, 128, 128, 128))
    timeit("enc1 UnetrBasic 48->48 @64^3",
           UnetrBasicBlock(fs[0], dtype=dt), (B, 64, 64, 64, 48))
    timeit("enc2 UnetrBasic 96->96 @32^3",
           UnetrBasicBlock(fs[1], dtype=dt), (B, 32, 32, 32, 96))
    timeit("enc3 UnetrBasic 192->192 @16^3",
           UnetrBasicBlock(fs[2], dtype=dt), (B, 16, 16, 16, 192))
    timeit("CC bottleneck 384 @8^3",
           ChannelCalibration(fs[3], reduction_ratio=4, dtype=dt),
           (B, 8, 8, 8, 384))
    def time_idwt(name, out_ch, stage, skip_grid):
        if args.only and args.only not in name:
            return
        keys = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")
        inp = jax.random.normal(key, (B, 8, 8, 8, 384), dt)
        skip = jax.random.normal(key, (B, *([skip_grid] * 3), out_ch), dt)
        hf = []
        for lv in range(stage):
            g = 8 * (2 ** lv)
            hf.append(
                {
                    k: jax.random.normal(
                        jax.random.fold_in(key, hash(k) % 1000 + lv),
                        (B, g, g, g, out_ch),
                        dt,
                    )
                    for k in keys
                }
            )
        mod = UnetrIDWTBlock(out_ch, stage=stage, dtype=dt)
        hf1 = jax.tree.map(lambda a: a[:1], hf)
        params = mod.init(jax.random.PRNGKey(1), inp[:1], skip[:1], hf1)
        fn = jax.jit(lambda p, a, s: mod.apply(p, a, s, hf))
        ms = device_time(
            functools.partial(fn, params), inp, skip, iters=args.iters
        ) * 1e3
        print(f"{name:42s} {ms:8.2f} ms   {ms / B:6.2f} ms/patch", flush=True)

    time_idwt("dec4 IDWT s1 384->192 (+skip 16^3)", fs[2], 1, 16)
    time_idwt("dec3 IDWT s2 384->96 (+skip 32^3)", fs[1], 2, 32)
    time_idwt("dec2 IDWT s3 384->48 (+skip 64^3)", fs[0], 3, 64)
    timeit("up4 ProjUp 192->48 x4",
           ProjectionUpsample(fs[2], fs[0], stride=4, residual=True,
                              use_double_conv=True, dtype=dt),
           (B, 16, 16, 16, 192))
    timeit("up3 ProjUp 96->48 x2",
           ProjectionUpsample(fs[1], fs[0], stride=2, residual=True, dtype=dt),
           (B, 32, 32, 32, 96))
    timeit("dec1 UnetrUp 144->48 @64->128^3",
           UnetrUpBlock(fs[0], dtype=dt),
           (B, 64, 64, 64, 144), (B, 128, 128, 128, 48))
    timeit("out head 48->4 @128^3 (cf_out)",
           UnetOutBlock(4, cf_out=True, dtype=dt), (B, 128, 128, 128, 48))


if __name__ == "__main__":
    # IDWT blocks take HF coefficient tuples; wrap via a shim module when
    # needed — see timeit call sites (handled inside UnetrIDWTBlock when
    # hf tuple is None? If not, this script adapts below).
    main()
