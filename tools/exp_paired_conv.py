"""Experiment: paired-output conv to beat the N=48 lane ceiling.

A 3x3x3 stride-1 conv with C_out=48 runs its matmuls at 48/128 lane
utilization. Pairing two adjacent W outputs into one strided conv
(kernel 3x3x4, stride (1,1,2), 2*C_out=96 channels = the two interleaved
output positions) raises lane utilization to 96/128 at 4/3 the MACs:
theoretical net ~1.5x on the MXU. The cost is a (W/2, 2, C) -> (W, C)
interleave on the output (or fusion into the consumer).

python -u tools/exp_paired_conv.py
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    path = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def pair_kernel(w: jax.Array) -> jax.Array:
    """(3,3,3,C,O) -> (3,3,4,C,2O): W'[...,kw',(j,o)] = W[...,kw'-j,o]."""
    k3, _, _, c, o = w.shape
    wp = np.zeros((3, 3, 4, c, 2 * o), w.dtype)
    w_np = np.asarray(w)
    for j in range(2):
        for t in range(3):
            wp[:, :, t + j, :, j * o:(j + 1) * o] = w_np[:, :, t]
    return jnp.asarray(wp)


def conv_fast(x, w):
    """Current fast path: 3 depth-batched 2D convs, (D,H,W,C) single vol."""
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


def conv_paired(x, wp, interleave=True):
    """Paired: 3 depth-batched 2D convs k=(3,4) stride (1,2) -> 2O ch."""
    d, h, width, c = x.shape
    o2 = wp.shape[-1]
    vp = jnp.pad(x, ((1, 1), (0, 0), (1, 1), (0, 0)))
    acc = None
    for kd in range(3):
        part = jax.lax.conv_general_dilated(
            vp[kd:kd + d], wp[kd], (1, 2), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        acc = part if acc is None else acc + part
    out2 = acc.astype(x.dtype)  # (D, H, W/2, 2O)
    if not interleave:
        return out2
    o = o2 // 2
    out = out2.reshape(d, h, width // 2, 2, o).reshape(d, h, width, o)
    return out


def inorm_apply(y):
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(y32, axis=(0, 1, 2), keepdims=True)
    return ((y32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)


def batched(fn):
    """lax.map over the leading batch axis (the scan-over-batch idiom)."""
    def run(xb, w):
        return jax.lax.map(lambda v: fn(v, w), xb)
    return run


def conv_paired_folded(xb, wp):
    """Paired conv with B·D folded into the 2D conv batch (no lax.map)."""
    b, d, h, width, c = xb.shape
    o2 = wp.shape[-1]
    vp = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)))
    acc = None
    for kd in range(3):
        flat = vp[:, kd : kd + d].reshape(b * d, h, width + 2, c)
        part = jax.lax.conv_general_dilated(
            flat, wp[kd], (1, 2), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        acc = part if acc is None else acc + part
    out2 = acc.astype(xb.dtype)
    o = o2 // 2
    return out2.reshape(b, d, h, width // 2, 2, o).reshape(
        b, d, h, width, o)


def main():
    _cache()
    from waveformer_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    for (cin, cout, s) in [(48, 48, 128), (96, 48, 128), (48, 48, 64)]:
        x = jax.random.normal(key, (s, s, s, cin), dt)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05
        wp = pair_kernel(w)

        f_base = jax.jit(conv_fast)
        f_pair = jax.jit(functools.partial(conv_paired, interleave=True))
        f_pair_raw = jax.jit(functools.partial(conv_paired, interleave=False))

        # correctness
        yb = f_base(x, w)
        ypr = f_pair(x, wp)
        err = float(jnp.max(jnp.abs(yb.astype(jnp.float32)
                                    - ypr.astype(jnp.float32))))
        print(f"[{cin}->{cout} @{s}^3] max|diff| = {err:.3e}")

        it = 32 if s == 128 else 64
        ms_b = device_time(f_base, x, w, iters=it) * 1e3
        ms_p = device_time(f_pair, x, wp, iters=it) * 1e3
        ms_pr = device_time(f_pair_raw, x, wp, iters=it) * 1e3
        print(f"  base fast path        {ms_b:7.3f} ms")
        print(f"  paired + interleave   {ms_p:7.3f} ms")
        print(f"  paired raw (no ilv)   {ms_pr:7.3f} ms")

        # with IN-apply consumer (does the interleave fuse?)
        g_base = jax.jit(lambda a, k: inorm_apply(conv_fast(a, k)))
        g_pair = jax.jit(
            lambda a, k: inorm_apply(conv_paired(a, k, interleave=True)))
        ms_gb = device_time(g_base, x, w, iters=it) * 1e3
        ms_gp = device_time(g_pair, x, wp, iters=it) * 1e3
        print(f"  base + IN             {ms_gb:7.3f} ms")
        print(f"  paired + ilv + IN     {ms_gp:7.3f} ms", flush=True)

    # batch-8 variants at the hot 48->48 @128^3 shape
    cin = cout = 48
    xb = jax.random.normal(key, (8, 128, 128, 128, cin), dt)
    w = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05
    wp = pair_kernel(w)
    f_map_base = jax.jit(batched(conv_fast))
    f_map_pair = jax.jit(batched(functools.partial(conv_paired)))
    f_fold = jax.jit(conv_paired_folded)
    yb = f_map_base(xb, w)
    yf = f_fold(xb, wp)
    err = float(jnp.max(jnp.abs(yb.astype(jnp.float32) - yf.astype(jnp.float32))))
    print(f"[B=8 48->48 @128^3] folded max|diff| = {err:.3e}")
    for name, fn, ww in [
        ("map(base)", f_map_base, w),
        ("map(paired)", f_map_pair, wp),
        ("folded paired", f_fold, wp),
    ]:
        ms = device_time(fn, xb, ww, iters=8) * 1e3
        print(f"  {name:20s} {ms:8.2f} ms  ({ms/8:6.2f} /patch)", flush=True)


if __name__ == "__main__":
    main()
