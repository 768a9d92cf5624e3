"""WaveFormer transformer-side layers: CCF-FFN, patch merging, upsamplers.

Each class documents the reference implementation it is behaviourally
equivalent to (file:line into /root/reference).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import (
    ChannelGroupNorm,
    Conv3d,
    gelu,
    he_fan_out_conv_init,
    trunc_normal_init,
)
from waveformer_tpu.ops.resize import resize_trilinear

Dtype = Any


class CCF_FFN(nn.Module):
    """Convolutional Channel Fusion FFN (reference `wave_helper.py:196-300`).

    pwconv(1³) → LN → GELU → dwconv(3³) → LN → GELU → Linear → +residual.
    Note: the residual here is *inside* the FFN; the enclosing block adds a
    second residual (`wave_helper.py:509`), replicated faithfully.
    LayerNorms use eps 1e-5 (reference constructs them with torch defaults,
    `wave_helper.py:428`).

    Layout: channels-last (B, D, H, W, C); the 1³ pwconv is a Dense (MXU).
    """

    hidden_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inp = x
        c_hid = self.hidden_features
        # pointwise conv == dense over channels
        h = nn.Dense(
            c_hid,
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="pwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = gelu(h)
        h = Conv3d(
            c_hid,
            kernel_size=3,
            groups=c_hid,
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="dwconv",
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = gelu(h)
        h = nn.Dense(
            inp.shape[-1],
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="fc",
        )(h)
        return inp + h


# Slice offsets of the reference PatchMerging v0.9 forward
# (`wave_helper.py:183-190`): note the historical duplicates — x5 repeats
# (0,1,0) and x6 repeats (0,0,1) while (1,1,0)/(0,1,1) are missing. Released
# checkpoints expect exactly this gather order, so it is replicated.
_PATCH_MERGE_OFFSETS: Tuple[Tuple[int, int, int], ...] = (
    (0, 0, 0),
    (1, 0, 0),
    (0, 1, 0),
    (0, 0, 1),
    (1, 0, 1),
    (0, 1, 0),
    (0, 0, 1),
    (1, 1, 1),
)


class PatchMerging(nn.Module):
    """Swin-style 2× downsample (reference `wave_helper.py:170-194`):
    8-way strided gather → LN(8C) → Linear 8C→2C (no bias)."""

    dim: int
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gathered = jnp.concatenate(
            [x[:, i::2, j::2, k::2, :] for (i, j, k) in _PATCH_MERGE_OFFSETS],
            axis=-1,
        )
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(
            gathered
        )
        return nn.Dense(
            2 * self.dim,
            use_bias=False,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="reduction",
        )(h)


class ProjectionUpsample(nn.Module):
    """Learnable upsampling (reference `wave_helper.py:33-81`):
    trilinear(align_corners=True) ×s → dw3³conv → GroupNorm(C) → 1³conv 2C →
    GELU → projection conv(s) (+ trilinear + 1³conv residual)."""

    in_channels: int
    out_channels: int
    stride: int = 2
    residual: bool = True
    use_double_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.in_channels
        out_size = tuple(s * self.stride for s in x.shape[1:4])
        up = resize_trilinear(x, out_size, align_corners=True)
        h = Conv3d(c, kernel_size=3, groups=c, dtype=self.dtype, name="conv1_dw")(up)
        h = ChannelGroupNorm(c, dtype=self.dtype, name="norm")(h)
        h = gelu(
            Conv3d(2 * c, kernel_size=1, dtype=self.dtype, name="conv2")(h)
        )
        if self.use_double_conv:
            h = Conv3d(c, kernel_size=1, dtype=self.dtype, name="conv3_0")(h)
            h = gelu(h)
            h = Conv3d(
                self.out_channels, kernel_size=1, dtype=self.dtype, name="conv3_1"
            )(h)
        else:
            h = Conv3d(
                self.out_channels, kernel_size=1, dtype=self.dtype, name="conv3"
            )(h)
        if self.residual:
            res = resize_trilinear(x, out_size, align_corners=True)
            res = Conv3d(
                self.out_channels, kernel_size=1, dtype=self.dtype, name="res_conv"
            )(res)
            h = h + res
        return h
