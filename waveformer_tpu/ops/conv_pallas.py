"""Pallas implicit-GEMM 3×3×3 convolution for TPU.

Why: XLA lowers small-channel 3D convs (C=48, the WaveFormer conv path) to
27 separate matmuls with K = N = 48 — both padded to the 128-wide MXU, ~12%
utilization (measured 11.4 ms for 48→48 @128³ on v5e, vs 54% util at
C=128). This kernel builds the full im2col row block **in VMEM** (never
materialized in HBM) and issues ONE matmul per tile with K = 27·C ≈ 1296 —
K-padding waste drops from 62% to ~1%, leaving only the unavoidable
N=48-lane padding.

Shapes: x (D, H, W, C) single volume, w (3, 3, 3, C, O), 'SAME' padding,
stride 1. The halo'd input window is DMA'd from HBM per grid step (halo
overlap rules out plain BlockSpec indexing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, o_ref, xb, sem, *, bh: int, width: int, cin: int):
    d = pl.program_id(0)
    h = pl.program_id(1)
    # copy the full (8-aligned) trailing dims; slice only D/H — Mosaic
    # requires DMA slice extents on the sublane dim to be 8-aligned
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(d, 3), pl.ds(h * bh, bh + 2)],
        xb,
        sem,
    )
    cp.start()
    cp.wait()
    block = xb[:]  # (3, bh+2, Wp, C) with Wp = roundup(width+2, 8)
    cols = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                patch = block[kd, kh : kh + bh, kw : kw + width, :]
                cols.append(patch.reshape(bh * width, cin))
    patches = jnp.concatenate(cols, axis=1)  # (bh·W, 27·C)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = out.reshape(1, bh, width, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def conv3x3x3_same(
    x: jax.Array,
    w: jax.Array,
    block_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """'SAME' 3×3×3 conv: (D, H, W, C) × (3, 3, 3, C, O) → (D, H, W, O)."""
    d, h, width, cin = x.shape
    o = w.shape[-1]
    if h % block_h != 0:
        raise ValueError(f"H={h} must be divisible by block_h={block_h}")
    wp = -(-(width + 2) // 8) * 8  # sublane-aligned padded width
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - width - 1), (0, 0)))
    wf = w.reshape(27 * cin, o).astype(x.dtype)

    kernel = functools.partial(_kernel, bh=block_h, width=width, cin=cin)
    return pl.pallas_call(
        kernel,
        grid=(d, h // block_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo'd input, manual DMA
            pl.BlockSpec(
                (27 * cin, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, width, o), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, width, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, block_h + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wf)


def conv3x3x3_batched(
    x: jax.Array, w: jax.Array, block_h: int = 8, interpret: bool = False
) -> jax.Array:
    """(B, D, H, W, C) batched wrapper (vmapped single-volume kernel)."""
    return jax.vmap(
        lambda v: conv3x3x3_same(v, w, block_h=block_h, interpret=interpret)
    )(x)
