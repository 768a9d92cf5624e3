"""Windowed multi-head self-attention with 3D relative position bias.

Equivalent of the reference `Attention` (`network_models/attention.py:15-104`).
The relative-position index uses the reference's exact (nonstandard) strides —
`coords[...,0] *= 3*ws-1`, `coords[...,1] *= 2*ws-1`
(`attention.py:53-54`) — which collides some index pairs relative to the
canonical (2w−1)² stride. Released checkpoints bake this arithmetic into the
bias table, so it is replicated bit-for-bit rather than "fixed".

TPU notes: QK^T and PV contractions run on the MXU in the configured compute
dtype (bf16 by default) with fp32 softmax; the bias gather is a static-index
table lookup folded into the compiled program.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from waveformer_tpu.models.common import trunc_normal_init


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """(N, N) int32 index into the (2w−1)³ bias table, N = window_size³.

    Replicates `attention.py:40-57` including the nonstandard depth/height
    strides at `:53-54`.
    """
    ws = window_size
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), np.arange(ws), indexing="ij")
    )
    coords_flatten = coords.reshape(3, -1)
    rel = coords_flatten[:, :, None] - coords_flatten[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel += ws - 1
    rel[:, :, 0] *= 3 * ws - 1  # reference quirk: depth stride 3w−1, not (2w−1)²
    rel[:, :, 1] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)


class WindowAttention(nn.Module):
    """MHSA over flattened windows: (B·nW, N, C) → (B·nW, N, C)."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale if self.qk_scale is not None else hd**-0.5

        qkv = nn.Dense(
            3 * c,
            use_bias=self.qkv_bias,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * self.window_size - 1) ** 3, h),
        )
        rpi = relative_position_index(self.window_size)
        bias = table[rpi.reshape(-1)].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1)  # (H, N, N)

        from waveformer_tpu.ops import attention_pallas as ap

        if ap.supported(n, hd) and jax.default_backend() == "tpu":
            # fused VMEM-resident window attention: XLA materializes the
            # fp32 score tensor ((B·nW, H, N, N) = 1.6 GB at stage 1) and
            # pays ~4 HBM passes over it; the kernel never writes it
            # (measured 2.65 vs 6.26 ms at the stage-1 shape, v5e)
            out = ap.window_attention(q, k, v, bias, scale)
        else:
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            attn = attn + bias[None].astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd",
                attn.astype(self.dtype),
                v,
                preferred_element_type=jnp.float32,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(self.dtype)
        out = nn.Dense(
            c, kernel_init=trunc_normal_init, dtype=self.dtype, name="proj"
        )(out)
        return out
