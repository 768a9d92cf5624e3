"""Fused CCF-FFN tail kernel for TPU (Pallas) — measured LOSER, kept as
documented groundwork (NOT wired into the model).

The reference CCF_FFN (`network_models/wave_helper.py:196-300`) runs
pwconv → LN → GELU → **dwconv(3³) → LN → GELU → Linear** → +residual.
When this kernel was designed the tail measured 3.5 ms/patch at the
flagship stage-1 shape (64³, 192ch hidden); after the erf-polynomial GELU
landed (commit 205dab8) XLA fuses the whole unfused composition to
**2.06 ms/patch — this kernel measures 3.24** (and 0.43 vs 1.00 at the
stage-2 shape). The slab-rotation DMA + 9 VMEM re-reads per output block
cost more than the elementwise fusions it saves. Verdict: with the GELU
fixed, XLA's fusion of dwconv+LN+GELU+matmul is already near traffic
roofline; keep the XLA path. (Correctness holds: interpret-mode and
on-device outputs match `_ffn_tail_reference` to bf16 rounding.)

The kernel computes the whole tail in one pass over the hidden tensor:

    out = (gelu(LN(dwconv3(h1) + b_dw)) @ W_fc + b_fc)

with a *slab-streaming* schedule: grid (B, D+2, H/rows); each step DMAs one
depth slab of `h1`, keeps the last three slabs in a rotating VMEM scratch,
and emits output slab d−1 computed from slabs (d−2, d−1, d).  The depthwise
taps are 27 shifted FMA slices on VMEM-resident slabs; LayerNorm is a lane
(channel-axis) reduction — tile-local, no global stats; the 192→C projection
runs on the MXU in-kernel.  HBM traffic is one read of `h1` + one write of
the output (the residual add happens outside, fused by XLA into the
consumer).

Gradients: `ffn_tail` carries a custom VJP whose backward re-derives from an
unfused reference composition (`_ffn_tail_reference`), so the kernel is safe
under `jax.grad` (training pays the unfused cost, inference gets the fused
kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_f32(x):
    """Exact-form GELU via the A&S 7.1.26 erf polynomial (fp32 in/out) —
    same formula as `models/common.gelu`."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    z = jnp.abs(x * 0.7071067811865476)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf = jnp.sign(x) * (1.0 - poly * jnp.exp(-z * z))
    return 0.5 * x * (1.0 + erf)


def _ln_f32(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(
    h1_ref,      # (1, 1, Hp2, Wp, Ch) — one prepadded slab of h1
    dww_ref,     # (27, Ch)
    dwb_ref,     # (1, Ch)
    lns_ref,     # (1, Ch)
    lnb_ref,     # (1, Ch)
    fcw_ref,     # (Ch, C)
    fcb_ref,     # (1, C)
    o_ref,       # (1, 1, rows, W, C)
    rot_ref,     # scratch (3, Hp2, Wp, Ch)
    *,
    d_total: int,
    h_total: int,
    w_total: int,
    rows: int,
    eps: float,
):
    s = pl.program_id(1)
    rh = pl.program_id(2)

    # stash the freshly arrived slab (slab index min(s, D-1); reloads past
    # the end are garbage and must NOT clobber live slots)
    @pl.when(jnp.logical_and(s <= d_total - 1, rh == 0))
    def _():
        rot_ref[pl.ds(s % 3, 1)] = h1_ref[0]

    @pl.when(s >= 1)
    def _():
        r0 = rh * rows
        ch = dww_ref.shape[1]
        acc = jnp.zeros((rows, w_total, ch), jnp.float32)
        for kd in range(3):
            slab_idx = s - 2 + kd  # original depth index of this tap slab
            valid = jnp.logical_and(slab_idx >= 0, slab_idx <= d_total - 1)
            for kh in range(3):
                # one VMEM load per (kd, kh); kw taps are value slices.
                # Out-of-range slabs read uninitialized scratch (may be NaN)
                # — select, don't multiply-by-zero.
                rowblk = rot_ref[
                    pl.ds(jnp.mod(slab_idx, 3), 1), pl.ds(r0 + kh, rows)
                ][0].astype(jnp.float32)  # (rows, Wp, Ch)
                rowblk = jnp.where(valid, rowblk, 0.0)
                for kw in range(3):
                    tap = dww_ref[
                        pl.ds((kd * 3 + kh) * 3 + kw, 1)
                    ]  # (1, Ch)
                    sl = rowblk[:, kw : kw + w_total, :]
                    acc = acc + tap[None] * sl
        acc = acc + dwb_ref[:][None]
        flat = acc.reshape(rows * w_total, ch)
        flat = _gelu_f32(_ln_f32(flat, lns_ref[:], lnb_ref[:], eps))
        out = jnp.dot(
            flat.astype(fcw_ref.dtype), fcw_ref[:],
            preferred_element_type=jnp.float32,
        ) + fcb_ref[:]
        o_ref[0, 0] = out.reshape(rows, w_total, -1).astype(o_ref.dtype)

    @pl.when(s < 1)
    def _():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


def _ffn_tail_reference(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps):
    """Unfused tail (same arithmetic): XLA path for fp32 / backward."""
    dt = h1.dtype
    out = jax.lax.conv_general_dilated(
        h1,
        dw_w.reshape(3, 3, 3, 1, -1).astype(dt),
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=h1.shape[-1],
    )
    out = out + dw_b.astype(dt)
    out32 = _ln_f32(out.astype(jnp.float32), ln_s, ln_b, eps)
    out = _gelu_f32(out32).astype(dt)
    out = jnp.einsum("...c,co->...o", out, fc_w.astype(dt))
    return out + fc_b.astype(dt)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8)
)
def ffn_tail(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps=1e-5,
             interpret=False):
    """Fused dwconv3³ → LN(lane) → GELU → Dense tail.

    h1: (B, D, H, W, Ch) hidden activations (bf16 on the TPU path).
    dw_w: (3, 3, 3, Ch) depthwise taps; dw_b/ln_s/ln_b: (Ch,); fc_w:
    (Ch, C); fc_b: (C,). Returns (B, D, H, W, C) in h1.dtype. The caller
    adds the FFN residual.
    """
    return _ffn_tail_impl(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps,
                          interpret)


def _ffn_tail_impl(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps, interpret):
    b, d, h, w, ch = h1.shape
    c_out = fc_w.shape[-1]
    wp = -(-(w + 2) // 8) * 8
    hp = h + 2
    # zero halo rows/cols once in HBM (bandwidth-trivial vs the kernel win)
    h1p = jnp.pad(h1, ((0, 0), (0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    rows = h if h <= 32 else 32
    if h % rows != 0:
        raise ValueError(f"H={h} not divisible by row block {rows}")
    n_rh = h // rows

    f32 = jnp.float32
    kern = functools.partial(
        _kernel, d_total=d, h_total=h, w_total=w, rows=rows, eps=eps,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, d + 1, n_rh),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hp, wp, ch),
                lambda bi, s, rh: (bi, jnp.clip(s, 0, d - 1), 0, 0, 0),
            ),
            pl.BlockSpec((27, ch), lambda bi, s, rh: (0, 0)),
            pl.BlockSpec((1, ch), lambda bi, s, rh: (0, 0)),
            pl.BlockSpec((1, ch), lambda bi, s, rh: (0, 0)),
            pl.BlockSpec((1, ch), lambda bi, s, rh: (0, 0)),
            pl.BlockSpec((ch, c_out), lambda bi, s, rh: (0, 0)),
            pl.BlockSpec((1, c_out), lambda bi, s, rh: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, w, c_out),
            lambda bi, s, rh: (bi, jnp.clip(s - 1, 0, d - 1), rh, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c_out), h1.dtype),
        scratch_shapes=[pltpu.VMEM((3, hp, wp, ch), h1.dtype)],
        interpret=interpret,
    )(
        h1p,
        dw_w.reshape(27, ch).astype(f32),
        dw_b.reshape(1, ch).astype(f32),
        ln_s.reshape(1, ch).astype(f32),
        ln_b.reshape(1, ch).astype(f32),
        fc_w.astype(h1.dtype),
        fc_b.reshape(1, c_out).astype(f32),
    )
    return out


def _ffn_tail_fwd(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps, interpret):
    out = _ffn_tail_impl(h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b, eps,
                         interpret)
    return out, (h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b)


def _ffn_tail_bwd(eps, interpret, res, g):
    h1, dw_w, dw_b, ln_s, ln_b, fc_w, fc_b = res
    _, vjp = jax.vjp(
        lambda *a: _ffn_tail_reference(*a, eps), h1, dw_w, dw_b, ln_s,
        ln_b, fc_w, fc_b,
    )
    return vjp(g)


ffn_tail.defvjp(_ffn_tail_fwd, _ffn_tail_bwd)
