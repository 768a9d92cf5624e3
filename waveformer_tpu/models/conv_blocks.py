"""Convolutional encoder/decoder blocks (MONAI dynunet/unetr equivalents).

Behavioural equivalents of the load-bearing MONAI slice (SURVEY.md §2.6):
`UnetResBlock`/`UnetBasicBlock` (`monai/networks/blocks/dynunet_block.py:25,114`),
`UnetrBasicBlock`/`UnetrUpBlock` (`unetr_block.py:209,22`), `UnetOutBlock`
(`dynunet_block.py:247`), plus the reference's `ChannelCalibration`
(`network_models/network_backbone.py:66-128`).

All channels-last, InstanceNorm(affine=False, eps 1e-5), LeakyReLU(0.01),
conv bias=False except the 1×1 output head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import (
    Conv3d,
    ConvTranspose2x,
    instance_norm,
    leaky_relu,
)

Dtype = Any


class UnetResBlock(nn.Module):
    """conv3→IN→lrelu→conv3→IN (+1×1 shortcut if channels change)→+→lrelu."""

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        h = leaky_relu(instance_norm(h.astype(jnp.float32))).astype(self.dtype)
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(h)
        h = instance_norm(h.astype(jnp.float32))
        if x.shape[-1] != self.out_channels:
            residual = Conv3d(
                self.out_channels,
                kernel_size=1,
                use_bias=False,
                dtype=self.dtype,
                name="conv3",
            )(residual)
            residual = instance_norm(residual.astype(jnp.float32))
        return leaky_relu(h + residual.astype(jnp.float32)).astype(self.dtype)


class UnetBasicBlock(nn.Module):
    """conv3→IN→lrelu→conv3→IN→lrelu (no shortcut)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        h = leaky_relu(instance_norm(h.astype(jnp.float32))).astype(self.dtype)
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(h)
        return leaky_relu(instance_norm(h.astype(jnp.float32))).astype(self.dtype)


class UnetrBasicBlock(nn.Module):
    """Skip-encoder block: UnetResBlock (res_block=True in the reference)."""

    out_channels: int
    kernel_size: int = 3
    res_block: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(
            self.out_channels,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="layer",
        )(x)


class UnetrUpBlock(nn.Module):
    """Final up block: convT(k2 s2) → concat skip → UnetResBlock."""

    out_channels: int
    kernel_size: int = 3
    res_block: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        up = ConvTranspose2x(
            self.out_channels, use_bias=False, dtype=self.dtype, name="transp_conv"
        )(x)
        h = jnp.concatenate([up, skip], axis=-1)
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(
            self.out_channels,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="conv_block",
        )(h)


class UnetOutBlock(nn.Module):
    """1×1×1 conv head with bias."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv3d(
            self.out_channels,
            kernel_size=1,
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)


class ChannelCalibration(nn.Module):
    """SE-style bottleneck recalibration (`network_backbone.py:66-128`):
    1³ reduce → IN → relu → 3³ conv → IN → relu → 1³ expand → IN →
    SE gate (global pool → fc → relu → fc → sigmoid) → ×, + 1³ residual → relu.

    Norms are InstanceNorm3d with torch defaults (affine=False), as passed at
    `network_backbone.py:286-290`.
    """

    in_channels: int
    reduction_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.in_channels
        rc = c // self.reduction_ratio
        identity = Conv3d(c, kernel_size=1, dtype=self.dtype, name="residual")(x)
        h = Conv3d(rc, kernel_size=1, dtype=self.dtype, name="reduce")(x)
        h = nn.relu(instance_norm(h.astype(jnp.float32))).astype(self.dtype)
        h = Conv3d(rc, kernel_size=3, dtype=self.dtype, name="conv")(h)
        h = nn.relu(instance_norm(h.astype(jnp.float32))).astype(self.dtype)
        h = Conv3d(c, kernel_size=1, dtype=self.dtype, name="expand")(h)
        h = instance_norm(h.astype(jnp.float32)).astype(self.dtype)
        se = jnp.mean(h, axis=(1, 2, 3))
        se = nn.relu(nn.Dense(rc, dtype=self.dtype, name="fc1")(se))
        se = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(se))
        h = h * se[:, None, None, None, :]
        return nn.relu(
            h.astype(jnp.float32) + identity.astype(jnp.float32)
        ).astype(self.dtype)
