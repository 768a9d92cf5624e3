"""Fine-grained op timings for the round-3 hotspots (up4/up3, enc0, dec1).

python -u tools/profile_pieces.py --batch 8
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    import os

    path = os.path.expanduser("~/.cache/wftpu_xla")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from waveformer_tpu.ops.resize import resize_trilinear
    from waveformer_tpu.models.common import instance_norm
    from waveformer_tpu.utils.profiling import device_time

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def t(name, fn, *xs, iters=None):
        if args.only and args.only not in name:
            return
        ms = device_time(jax.jit(fn), *xs, iters=iters or args.iters) * 1e3
        print(f"{name:46s} {ms:8.2f} ms  {ms / B:6.3f} ms/patch", flush=True)

    # ---- up4 pieces: 192ch, 16^3 -> 64^3
    x16 = jax.random.normal(key, (B, 16, 16, 16, 192), dt)
    x64_192 = jax.random.normal(key, (B, 64, 64, 64, 192), dt)
    t("up4 resize x4 16->64 (192ch)",
      lambda a: resize_trilinear(a, (64, 64, 64), align_corners=True), x16)
    kdw = jax.random.normal(key, (3, 3, 3, 1, 192), dt)

    def dw_grouped(a):
        return jax.lax.conv_general_dilated(
            a, kdw, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=192,
        )

    t("up4 dwconv grouped 192 @64^3", dw_grouped, x64_192)

    def dw_stencil(a):
        ap_ = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros(a.shape, jnp.float32)
        d, h, w = a.shape[1:4]
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    acc = acc + (
                        ap_[:, kd:kd + d, kh:kh + h, kw:kw + w]
                        * kdw[kd, kh, kw, 0]
                    ).astype(jnp.float32)
        return acc.astype(a.dtype)

    t("up4 dwconv stencil 192 @64^3", dw_stencil, x64_192)
    t("up4 groupnorm fp32 @64^3x192",
      lambda a: instance_norm(a.astype(jnp.float32)).astype(a.dtype), x64_192)
    k1 = jax.random.normal(key, (192, 384), dt)
    t("up4 1x1 conv 192->384 @64^3 einsum",
      lambda a: jnp.einsum("...c,co->...o", a, k1), x64_192)

    # ---- enc0 pieces: (B, 4, 128^3) cf -> 48
    x_cf = jax.random.normal(key, (B, 4, 128, 128, 128), dt)
    k27 = jax.random.normal(key, (27 * 4, 48), dt)

    def enc0_conv1(a):
        b, c, d, h, w = a.shape
        ap_ = jnp.pad(a, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
        taps = [
            ap_[:, :, kd:kd + d, kh:kh + h, kw:kw + w]
            for kd in range(3) for kh in range(3) for kw in range(3)
        ]
        stacked = jnp.concatenate(taps, axis=1)
        return jnp.einsum("bkdhw,ko->bdhwo", stacked, k27)

    t("enc0 conv1 cf_in tap-einsum 4->48 @128^3", enc0_conv1, x_cf, iters=16)

    x128_48 = jax.random.normal(key, (B, 128, 128, 128, 48), dt)
    k33 = jax.random.normal(key, (3, 3, 3, 48, 48), dt)

    def conv3_fast(a):
        def one(vol):
            d = vol.shape[0]
            vp = jnp.pad(vol, ((1, 1), (0, 0), (0, 0), (0, 0)))
            acc = None
            for kd in range(3):
                part = jax.lax.conv_general_dilated(
                    vp[kd:kd + d], k33[kd], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(jnp.float32)
                acc = part if acc is None else acc + part
            return acc.astype(vol.dtype)
        return jax.lax.map(one, a)

    t("conv 48->48 3^3 @128^3 (fast path, map)", conv3_fast, x128_48, iters=16)

    def conv3_batched(a):
        return jax.lax.conv_general_dilated(
            a, k33, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    t("conv 48->48 3^3 @128^3 (XLA 3D batched)", conv3_batched, x128_48,
      iters=16)
    t("instnorm fp32 @128^3x48",
      lambda a: instance_norm(a.astype(jnp.float32)).astype(a.dtype),
      x128_48, iters=16)

    # dec1 res-block conv: 96 -> 48 @128^3
    x128_96 = jax.random.normal(key, (B, 128, 128, 128, 96), dt)
    k96 = jax.random.normal(key, (3, 3, 3, 96, 48), dt)

    def conv96_fast(a):
        def one(vol):
            d = vol.shape[0]
            vp = jnp.pad(vol, ((1, 1), (0, 0), (0, 0), (0, 0)))
            acc = None
            for kd in range(3):
                part = jax.lax.conv_general_dilated(
                    vp[kd:kd + d], k96[kd], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(jnp.float32)
                acc = part if acc is None else acc + part
            return acc.astype(vol.dtype)
        return jax.lax.map(one, a)

    t("conv 96->48 3^3 @128^3 (fast path, map)", conv96_fast, x128_96,
      iters=16)


if __name__ == "__main__":
    main()
