"""Depthwise 3³ conv stencil for TPU (Pallas).

The CCF_FFN depthwise conv (`wave_helper.py:196-300` dwconv; our
`models/layers.py::CCF_FFN`) is pure bandwidth: 27 MACs/element over a
channels-last volume. XLA's grouped-conv lowering runs it ~10× off the
HBM roofline (measured 1.3 ms/patch at 64³×384 inside the sw_batch=8
program, vs a ~0.15 ms read+write floor). This kernel keeps the whole
(H, W, C) slab stack in VMEM and applies the 27-tap stencil as shifted
multiply-adds:

  * input is pre-padded by 1 in D/H/W (one fused XLA pad);
  * grid is (B, D): each program reads three padded depth slabs
    (same array bound three times with offset index maps — the Pallas
    stencil idiom for overlapping windows) and writes one output slab;
  * the fp32 accumulator lives only in VMEM/registers; per-channel
    weights broadcast over sublanes from a (3, 3, 3, C) block that is
    constant across the grid (DMA'd once).

Gradients: `custom_vjp` falls back to the XLA grouped conv for the
backward (training pays the XLA cost; inference gets the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref):
    # x*: (1, 1, H+2, W+2, C) padded slabs at depth d, d+1, d+2;
    # w: (3, 3, 3, C); o: (1, 1, H, W, C)
    h, w = o_ref.shape[2], o_ref.shape[3]
    acc = None
    for kd, ref in enumerate((x0_ref, x1_ref, x2_ref)):
        slab = ref[0, 0].astype(jnp.float32)  # (H+2, W+2, C)
        for kh in range(3):
            for kw in range(3):
                tap = slab[kh : kh + h, kw : kw + w, :]
                term = tap * w_ref[kd, kh, kw][None, None, :]
                acc = term if acc is None else acc + term
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _dwconv3_impl(x, kernel, interpret):
    """x: (B, D, H, W, C); kernel (3, 3, 3, C) → (B, D, H, W, C)."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    slab_spec = lambda off: pl.BlockSpec(
        (1, 1, h + 2, w + 2, c), lambda bi, di: (bi, di + off, 0, 0, 0)
    )
    return pl.pallas_call(
        _kernel,
        grid=(b, d),
        in_specs=[
            slab_spec(0),
            slab_spec(1),
            slab_spec(2),
            pl.BlockSpec((3, 3, 3, c), lambda bi, di: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, c), lambda bi, di: (bi, di, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, kernel.astype(jnp.float32))


def _reference(x, kernel):
    """XLA grouped-conv composition (the fallback / backward path)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        kernel.reshape(3, 3, 3, 1, c).astype(x.dtype),
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dwconv3(x, kernel, interpret: bool = False):
    """Depthwise 3³ 'same' conv, channels-last, VMEM-resident stencil.

    x: (B, D, H, W, C) in compute dtype; kernel: (3, 3, 3, C).
    Bias (if any) is the caller's job — it fuses into the consumer.
    """
    return _dwconv3_impl(x, kernel, interpret)


def _fwd(x, kernel, interpret):
    return _dwconv3_impl(x, kernel, interpret), (x, kernel)


def _bwd(interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda a, k: _reference(a, k.astype(x.dtype)), x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


dwconv3.defvjp(_fwd, _bwd)


def supported(d: int, h: int, w: int, c: int) -> bool:
    """Shapes the kernel handles: three padded slabs + fp32 accumulator
    resident in VMEM. Ragged lane dims are allowed — Mosaic pads to the
    next 128 multiple; the padding waste is far below XLA's grouped-conv
    gap. The binding constraint is Mosaic's 16 MiB *scoped* (stack) VMEM
    limit, not total VMEM: the stack holds the three bf16 input slabs,
    the bf16 output slab, the fp32 accumulator, and one fp32 slab temp
    from the `astype` (measured 17.92 MiB at 64³ c=192/cp=256 → compile
    OOM). Gate against that model with headroom."""
    cp = -(-c // 128) * 128  # lane-padded channel count
    slab = (h + 2) * (w + 2) * cp
    out = h * w * cp
    stack = 3 * slab * 2 + out * 2 + out * 4 + slab * 4
    return c % 8 == 0 and c >= 96 and stack <= 14 * 1024 * 1024 and d >= 1
