"""Experiment: kd-grouped conv — raise the conv GEMM's lane utilization
by grouping the three depth taps as 3·O output channels of ONE 2D conv.

The shipped fast path runs a 3³ conv as 3 depth-batched 2D convs with
C_out = 48 → every GEMM at 48/128 lane utilization. Grouping the kd taps
into one (3, 3, C, 3·O) 2D conv raises N to 144 (padded 256 ⇒ 56% util)
at IDENTICAL MACs; the cross-slab combine becomes three D-shifted slice
adds, which are major-dim offsets (no lane ops) and fuse into the
consumer. A second variant also groups kh (kernel (1, 3, C, 9·O), N=432
→ padded 512 ⇒ 84% util) at the price of a 9·O-channel intermediate.

python -u tools/exp_kdgroup_conv.py
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _cache():
    path = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def conv_fast(x, w):
    """Shipped fast path: 3 depth-batched 2D convs, (D,H,W,C) single vol."""
    d = x.shape[0]
    vp = jnp.pad(x, ((1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for kd in range(3):
        part = jax.lax.conv_general_dilated(
            vp[kd:kd + d], w[kd], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def conv_kdg(x, w):
    """kd-grouped: ONE 2D conv with 3·O channels + D-shifted slice adds."""
    d = x.shape[0]
    o = w.shape[-1]
    vp = jnp.pad(x, ((1, 1), (0, 0), (0, 0), (0, 0)))
    # (3, 3, 3, C, O) -> (3, 3, C, 3O): channel block kd holds W[kd]
    wg = jnp.concatenate([w[0], w[1], w[2]], axis=-1)
    p = jax.lax.conv_general_dilated(
        vp, wg, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # out[dd] = P[dd, :48] + P[dd+1, 48:96] + P[dd+2, 96:144]
    acc = (
        p[0:d, ..., 0:o].astype(jnp.float32)
        + p[1:d + 1, ..., o:2 * o].astype(jnp.float32)
        + p[2:d + 2, ..., 2 * o:3 * o].astype(jnp.float32)
    )
    return acc.astype(x.dtype)


def conv_kdg_nopad(x, w):
    """kd-grouped WITHOUT the padded-volume copy: conv the raw volume,
    handle the D edges with zero-padded shifted adds (fuse into consumer)."""
    o = w.shape[-1]
    wg = jnp.concatenate([w[0], w[1], w[2]], axis=-1)
    p = jax.lax.conv_general_dilated(
        x, wg, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    z = jnp.zeros_like(p[:1, ..., :o], jnp.float32)
    # out[dd] = P[dd-1, blk0] + P[dd, blk1] + P[dd+1, blk2]
    acc = (
        jnp.concatenate([z, p[:-1, ..., 0:o].astype(jnp.float32)], axis=0)
        + p[..., o:2 * o].astype(jnp.float32)
        + jnp.concatenate([p[1:, ..., 2 * o:3 * o].astype(jnp.float32), z],
                          axis=0)
    )
    return acc.astype(x.dtype)


def conv_kdg9(x, w):
    """kd+kh-grouped: kw-only conv with 9·O channels + D/H shifted adds."""
    d, h, width, c = x.shape
    o = w.shape[-1]
    vp = jnp.pad(x, ((1, 1), (1, 1), (0, 0), (0, 0)))
    # (3, 3, 3, C, O) -> (1, 3, C, 9O): block (kd,kh) holds W[kd,kh]
    wg = jnp.concatenate(
        [w[kd, kh] for kd in range(3) for kh in range(3)], axis=-1
    )[None]
    p = jax.lax.conv_general_dilated(
        vp, wg, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    acc = None
    for kd in range(3):
        for kh in range(3):
            blk = kd * 3 + kh
            term = p[
                kd:kd + d, kh:kh + h, :, blk * o:(blk + 1) * o
            ].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def inorm_apply(y):
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(y32, axis=(0, 1, 2), keepdims=True)
    return ((y32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)


def batched(fn):
    def run(xb, w):
        return jax.lax.map(lambda v: fn(v, w), xb)
    return run


def main():
    _cache()
    from waveformer_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    for (cin, cout, s) in [(48, 48, 128), (96, 48, 128), (48, 48, 64),
                           (4, 48, 128)]:
        x = jax.random.normal(key, (s, s, s, cin), dt)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05

        f_base = jax.jit(conv_fast)
        f_kdg = jax.jit(conv_kdg)
        f_kdgn = jax.jit(conv_kdg_nopad)
        f_kdg9 = jax.jit(conv_kdg9)

        yb = f_base(x, w)
        for name, f in [("kdg", f_kdg), ("kdg_nopad", f_kdgn),
                        ("kdg9", f_kdg9)]:
            yv = f(x, w)
            err = float(jnp.max(jnp.abs(
                yb.astype(jnp.float32) - yv.astype(jnp.float32))))
            print(f"[{cin}->{cout} @{s}^3] {name} max|diff| = {err:.3e}")

        it = 32 if s == 128 else 64
        ms_b = device_time(f_base, x, w, iters=it) * 1e3
        ms_g = device_time(f_kdg, x, w, iters=it) * 1e3
        ms_gn = device_time(f_kdgn, x, w, iters=it) * 1e3
        ms_g9 = device_time(f_kdg9, x, w, iters=it) * 1e3
        print(f"  base fast path   {ms_b:7.3f} ms")
        print(f"  kd-grouped 3O    {ms_g:7.3f} ms")
        print(f"  kdg nopad        {ms_gn:7.3f} ms")
        print(f"  kdkh-grouped 9O  {ms_g9:7.3f} ms")

        g_base = jax.jit(lambda a, k: inorm_apply(conv_fast(a, k)))
        g_kdg = jax.jit(lambda a, k: inorm_apply(conv_kdg(a, k)))
        g_kdgn = jax.jit(lambda a, k: inorm_apply(conv_kdg_nopad(a, k)))
        ms_gb = device_time(g_base, x, w, iters=it) * 1e3
        ms_gg = device_time(g_kdg, x, w, iters=it) * 1e3
        ms_ggn = device_time(g_kdgn, x, w, iters=it) * 1e3
        print(f"  base + IN        {ms_gb:7.3f} ms")
        print(f"  kdg  + IN        {ms_gg:7.3f} ms")
        print(f"  kdgn + IN        {ms_ggn:7.3f} ms", flush=True)

    # batch-8 map variants at the hot shapes
    for (cin, cout) in [(48, 48), (96, 48)]:
        xb = jax.random.normal(key, (8, 128, 128, 128, cin), dt)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05
        f_map_base = jax.jit(batched(conv_fast))
        f_map_kdg = jax.jit(batched(conv_kdg))
        f_map_kdgn = jax.jit(batched(conv_kdg_nopad))
        for name, fn in [("map(base)", f_map_base), ("map(kdg)", f_map_kdg),
                         ("map(kdgn)", f_map_kdgn)]:
            ms = device_time(fn, xb, w, iters=8) * 1e3
            print(f"[B=8 {cin}->{cout}] {name:12s} {ms:8.2f} ms "
                  f"({ms/8:6.2f} /patch)", flush=True)


if __name__ == "__main__":
    main()
