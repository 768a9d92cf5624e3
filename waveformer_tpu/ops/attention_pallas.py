"""Fused window attention for TPU (Pallas).

The WaveFormer attention (`network_models/attention.py:83-104`) runs on
fixed 8³ = 512-token windows with head_dim 16 at every stage (SURVEY §2.2:
`window_size = img_size // 2**level` is 8 everywhere). XLA's lowering
materializes the fp32 score tensor — (B·nW, H, 512, 512) is 1.6 GB at the
stage-1 shape — and pays ~4 HBM passes over it (write, softmax reduce,
normalize, re-read for PV). At 512 tokens the ENTIRE window fits VMEM, so
this kernel computes scores + bias + softmax + PV per (head, window) block
without ever touching HBM with the scores:

  * q/k/v ride in a (BW, H·D, N) layout — N=512 minor (full lanes, no
    padding), head slices are contiguous D-row blocks;
  * grid is (H, BW) with the window index fastest, so the (N, N) fp32 bias
    block for head h stays resident in VMEM across all windows of that head
    (Pallas skips the DMA when the block index repeats);
  * scores (512², fp32, 1 MB) live only in VMEM; softmax is fp32 exactly
    like the XLA path (same arithmetic, fp-level parity).

HBM traffic drops from ~6 GB to ~0.15 GB per stage-1 attention call.
Gradients: `custom_vjp` falls back to the reference composition for the
backward (training pays the XLA cost; inference gets the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    # blocks: q/k/v/o (1, D, N); bias (1, N, N) fp32
    qb = q_ref[0].astype(jnp.float32)          # (D, N)
    kb = k_ref[0].astype(jnp.float32)
    # scores[q, k] = Σ_d qb[d, q]·kb[d, k]
    s = jax.lax.dot_general(
        qb * scale, kb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b_ref[0]
    s = jax.nn.softmax(s, axis=-1)
    vb = v_ref[0]                               # (D, N) compute dtype
    # out[d, q] = Σ_k vb[d, k]·s[q, k]
    o = jax.lax.dot_general(
        vb, s.astype(vb.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _window_attention_impl(q, k, v, bias, scale, interpret):
    """q/k/v: (BW, H, N, D); bias (H, N, N) fp32 → (BW, H, N, D)."""
    bw, h, n, d = q.shape

    def to_kernel_layout(t):  # (BW, H, N, D) → (BW, H·D, N)
        return t.transpose(0, 1, 3, 2).reshape(bw, h * d, n)

    qt, kt, vt = (to_kernel_layout(t) for t in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(h, bw),  # window index fastest → bias block cached per head
        in_specs=[
            pl.BlockSpec((1, d, n), lambda hi, bi: (bi, hi, 0)),
            pl.BlockSpec((1, d, n), lambda hi, bi: (bi, hi, 0)),
            pl.BlockSpec((1, d, n), lambda hi, bi: (bi, hi, 0)),
            pl.BlockSpec((1, n, n), lambda hi, bi: (hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, n), lambda hi, bi: (bi, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((bw, h * d, n), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, bias.astype(jnp.float32))
    return out.reshape(bw, h, d, n).transpose(0, 1, 3, 2)


def _reference(q, k, v, bias, scale):
    """The XLA composition (`models/attention.py` inner math)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    s = s + bias[None].astype(jnp.float32)
    s = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", s.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def window_attention(q, k, v, bias, scale: float, interpret: bool = False):
    """softmax(q·kᵀ·scale + bias)·v over fixed-size windows, fused in VMEM.

    q/k/v: (B·nW, H, N, D) in compute dtype; bias: (H, N, N).
    Returns (B·nW, H, N, D) in the input dtype.
    """
    return _window_attention_impl(q, k, v, bias, scale, interpret)


def _fwd(q, k, v, bias, scale, interpret):
    return _window_attention_impl(q, k, v, bias, scale, interpret), (
        q, k, v, bias,
    )


def _bwd(scale, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, scale), q, k, v, bias)
    return vjp(g.astype(q.dtype))


window_attention.defvjp(_fwd, _bwd)


def supported(n: int, d: int) -> bool:
    """Shapes the kernel handles: whole window resident in VMEM, lane-tiled
    cleanly. N multiple of 128 keeps the (N, N) scores MXU/VPU aligned."""
    return n % 128 == 0 and n <= 1024 and d % 8 == 0 and d <= 128
