"""Fused Pallas 3×3×3 convolution for the WaveFormer conv path.

Why this exists (measured on v5e, flagship 128³ patch):

XLA's lowering of the conv path is *per-op* fast — a 48→48 3³ conv runs at
its N=48 lane ceiling (~3.5 ms) — but the composition is slow: the
2D-decomposed convs make XLA assign exotic operand layouts, and every
conv→norm→conv boundary materializes fp32 normalize outputs plus big
"data formatting" copies (~26 ms of pure copies in a 90 ms forward,
`BENCH_NOTES.md` round-2 accounting).

This kernel computes the conv in the STANDARD (D, H, W, C) bf16 layout —
no layout freedom, no copies — and fuses the InstanceNorm epilogue/prologue:

  * `emit_stats=True`: per-channel Σ and Σ² of the fp32 accumulator are
    accumulated across the (sequential) grid into a (2, O) output — the
    next norm's statistics come for free with the conv pass.
  * `prologue=(mean, rstd)`: the input is normalized (and LeakyReLU'd)
    on load, so `conv(lrelu(IN(x)))` chains never materialize the
    normalized tensor in HBM.

Structure: manual-DMA halo blocks (BlockSpec slices cannot overlap), grid
over (D, H/block_h), 27 tap-dots accumulated in fp32 VMEM
(`ops/conv_pallas.py` holds the im2col K=27C variants; at C∈{48,96} the
tap-dot form measures equal or better and needs far less VMEM).

Equivalent of the reference's cuDNN conv + InstanceNorm3d + LeakyReLU
stacks inside `monai/networks/blocks/dynunet_block.py:23-86`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.01  # MONAI dynunet LeakyReLU slope


def _kernel(
    x_hbm,
    w_ref,
    nrm_ref,
    y_ref,
    st_ref,
    xb,
    sem,
    *,
    bh: int,
    width: int,
    cin: int,
    cout: int,
    prologue: bool,
    act: bool,
    stats: bool,
):
    d = pl.program_id(0)
    h = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(d, 3), pl.ds(h * bh, bh + 2)], xb, sem
    )
    cp.start()
    cp.wait()
    block = xb[:]  # (3, bh+2, Wp, C)
    if prologue:
        b32 = block.astype(jnp.float32)
        mean = nrm_ref[0]  # (C,)
        rstd = nrm_ref[1]
        b32 = (b32 - mean) * rstd
        if act:
            b32 = jnp.where(b32 >= 0, b32, b32 * NEG_SLOPE)
        # the conv's 'SAME' zero-padding must stay zero AFTER normalization:
        # zero the halo cells that fall outside the volume
        dtot = pl.num_programs(0)
        htot = pl.num_programs(1) * bh
        dd = jax.lax.broadcasted_iota(jnp.int32, b32.shape, 0) + d
        hh = jax.lax.broadcasted_iota(jnp.int32, b32.shape, 1) + h * bh
        ww = jax.lax.broadcasted_iota(jnp.int32, b32.shape, 2)
        valid = (
            (dd > 0) & (dd < dtot + 1)
            & (hh > 0) & (hh < htot + 1)
            & (ww > 0) & (ww < width + 1)
        )
        b32 = jnp.where(valid, b32, 0.0)
        block = b32.astype(xb.dtype)

    acc = jnp.zeros((bh * width, cout), jnp.float32)
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                patch = block[kd, kh : kh + bh, kw : kw + width, :]
                acc = acc + jnp.dot(
                    patch.reshape(bh * width, cin),
                    w_ref[(kd * 3 + kh) * 3 + kw],
                    preferred_element_type=jnp.float32,
                )
    y_ref[0] = acc.reshape(bh, width, cout).astype(y_ref.dtype)

    if stats:
        s = jnp.stack([jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)])
        first = jnp.logical_and(d == 0, h == 0)

        @pl.when(first)
        def _():
            st_ref[:] = s

        @pl.when(jnp.logical_not(first))
        def _():
            st_ref[:] = st_ref[:] + s


@functools.partial(
    jax.jit,
    static_argnames=("emit_stats", "act", "block_h", "interpret"),
)
def conv3x3x3_fused(
    x: jax.Array,
    w: jax.Array,
    prologue: Optional[Tuple[jax.Array, jax.Array]] = None,
    emit_stats: bool = False,
    act: bool = True,
    block_h: Optional[int] = None,
    interpret: bool = False,
):
    """'SAME' 3³ conv, single volume (D, H, W, C) × (3, 3, 3, C, O).

    prologue: optional (mean, rstd) fp32 (C,) vectors — input is
        instance-normalized (+ LeakyReLU when `act`) on load.
    emit_stats: also return (2, O) fp32 [Σ, Σ²] of the raw fp32 output.

    Returns y (D, H, W, O) in x.dtype, or (y, stats).
    """
    d, h, width, cin = x.shape
    o = w.shape[-1]
    if block_h is None:
        block_h = 32 if h % 32 == 0 else 8
    if h % block_h != 0:
        raise ValueError(f"H={h} not divisible by block_h={block_h}")
    wp = -(-(width + 2) // 8) * 8
    # Mosaic DMA lane extents must be 128-aligned: zero-pad C to 128.
    # The zero rows contribute nothing to the dot, and K<128 pads to a full
    # MXU tile anyway — the only real cost is the padded input DMA traffic.
    cp = -(-cin // 128) * 128
    xp = jnp.pad(
        x, ((1, 1), (1, 1), (1, wp - width - 1), (0, cp - cin))
    )
    wf = jnp.pad(
        w.reshape(27, cin, o), ((0, 0), (0, cp - cin), (0, 0))
    ).astype(x.dtype)
    if prologue is None:
        nrm = jnp.ones((2, cp), jnp.float32)
    else:
        nrm = jnp.stack(
            [
                jnp.pad(prologue[0].astype(jnp.float32), (0, cp - cin)),
                jnp.pad(
                    prologue[1].astype(jnp.float32),
                    (0, cp - cin),
                    constant_values=1.0,
                ),
            ]
        )

    kernel = functools.partial(
        _kernel,
        bh=block_h,
        width=width,
        cin=cp,
        cout=o,
        prologue=prologue is not None,
        act=act,
        stats=emit_stats,
    )
    out_shapes = [jax.ShapeDtypeStruct((d, h, width, o), x.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, block_h, width, o),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    # stats output always present (grid-constant block); sliced off when
    # unused so the kernel signature stays uniform
    out_shapes.append(jax.ShapeDtypeStruct((2, o), jnp.float32))
    out_specs.append(
        pl.BlockSpec((2, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    )
    y, st = pl.pallas_call(
        kernel,
        grid=(d, h // block_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (27, cp, o), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, block_h + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wf, nrm)
    if emit_stats:
        return y, st
    return y


def moments_from_stats(st: jax.Array, n: int, eps: float = 1e-5):
    """(2, O) [Σ, Σ²] → per-channel (mean, rstd) over n voxels."""
    mean = st[0] / n
    var = jnp.maximum(st[1] / n - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


# --------------------------------------------------------------------------- #
# fused residual block forward (UnetResBlock semantics)
# --------------------------------------------------------------------------- #


def _res_block_xla(x, w1, w2, w3):
    """Reference XLA composition (UnetResBlock without module scaffolding):
    used as the backward rule and the numerical oracle."""
    from waveformer_tpu.models.common import instance_norm

    def conv3(v, k):
        dnums = ("NDHWC", "DHWIO", "NDHWC")
        return jax.lax.conv_general_dilated(
            v[None], k.astype(v.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=dnums,
        )[0]

    lrelu = lambda t: jnp.where(t >= 0, t, t * NEG_SLOPE)
    h = conv3(x, w1).astype(jnp.float32)
    h = lrelu(instance_norm(h[None])[0]).astype(x.dtype)
    h = conv3(h, w2).astype(jnp.float32)
    h = instance_norm(h[None])[0]
    if w3 is not None:
        r = jnp.einsum("dhwc,co->dhwo", x, w3[0, 0, 0].astype(x.dtype))
        r = instance_norm(r.astype(jnp.float32)[None])[0]
    else:
        r = x.astype(jnp.float32)
    return lrelu(h + r).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def res_block_fused(x, w1, w2, w3):
    """UnetResBlock forward on the fused Pallas path (single volume,
    (D, H, W, C) → (D, H, W, O)); backward falls back to the XLA
    composition (the training path keeps the XLA backend anyway)."""
    return _res_block_fused_impl(x, w1, w2, w3)


def _res_block_fused_impl(x, w1, w2, w3):
    d, h, width, _ = x.shape
    o = w1.shape[-1]
    n = d * h * width
    y1, st1 = conv3x3x3_fused(x, w1, emit_stats=True, act=False)
    m1, r1 = moments_from_stats(st1, n)
    y2, st2 = conv3x3x3_fused(
        y1, w2, prologue=(m1, r1), emit_stats=True, act=True
    )
    m2, r2 = moments_from_stats(st2, n)
    if w3 is not None:
        s = jnp.einsum(
            "dhwc,co->dhwo", x, w3[0, 0, 0].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        ms = jnp.mean(s, axis=(0, 1, 2))
        vs = jnp.maximum(jnp.mean(s * s, axis=(0, 1, 2)) - ms * ms, 0.0)
        rs = jax.lax.rsqrt(vs + 1e-5)
        resid = (s - ms) * rs
    else:
        resid = x.astype(jnp.float32)
    out = (y2.astype(jnp.float32) - m2) * r2 + resid
    return jnp.where(out >= 0, out, out * NEG_SLOPE).astype(x.dtype)


def _res_fwd(x, w1, w2, w3):
    return _res_block_fused_impl(x, w1, w2, w3), (x, w1, w2, w3)


def _res_bwd(residuals, g):
    x, w1, w2, w3 = residuals
    if w3 is None:
        _, vjp = jax.vjp(lambda a, b, c: _res_block_xla(a, b, c, None),
                         x, w1, w2)
        dx, dw1, dw2 = vjp(g)
        return dx, dw1, dw2, None
    _, vjp = jax.vjp(_res_block_xla, x, w1, w2, w3)
    return vjp(g)


res_block_fused.defvjp(_res_fwd, _res_bwd)
