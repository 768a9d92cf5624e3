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
    """conv3→IN→lrelu→conv3→IN (+1×1 shortcut if channels change)→+→lrelu.

    `cf_in=True` consumes a channels-FIRST (B, C, D, H, W) input — used by
    the full-resolution skip encoder whose 4-channel input would otherwise
    be stored 32×-lane-padded (see `_Conv3dCore.cf_in`)."""

    out_channels: int
    kernel_size: int = 3
    cf_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jax.Array:
        # A tuple input is the channel-concatenation of its parts, consumed
        # without materializing the concat (see `_Conv3dCore`): conv1 and
        # the 1×1 shortcut slice their single kernel parameter per part.
        pair = isinstance(x, tuple)
        residual = x
        if pair:
            in_ch = sum(p.shape[-1] for p in x)
        else:
            in_ch = x.shape[1] if self.cf_in else x.shape[-1]
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            cf_in=self.cf_in,
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
        if in_ch != self.out_channels:
            residual = Conv3d(
                self.out_channels,
                kernel_size=1,
                use_bias=False,
                dtype=self.dtype,
                cf_in=self.cf_in,
                name="conv3",
            )(residual)
            residual = instance_norm(residual.astype(jnp.float32))
        elif pair:
            # identity shortcut over a pair input (ΣC == out): the concat
            # must materialize for the add — outside the hot configs
            residual = jnp.concatenate(residual, axis=-1)
        elif self.cf_in:
            # identity shortcut on a channels-first input: h is channels-last
            # by now, so bring the residual to the same layout
            residual = jnp.moveaxis(residual, 1, -1)
        return leaky_relu(h + residual.astype(jnp.float32)).astype(self.dtype)


class UnetBasicBlock(nn.Module):
    """conv3→IN→lrelu→conv3→IN→lrelu (no shortcut)."""

    out_channels: int
    kernel_size: int = 3
    cf_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            cf_in=self.cf_in,
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


def _scan_over_batch(block: nn.Module, x: jax.Array) -> jax.Array:
    """Apply a per-sample block sequentially over the batch axis.

    The conv fast path is a per-volume formulation; at B>1 a naive lax.map
    per CONV pays a batch slice + layout copy + write-back per conv
    (~3 ms/volume @128³ on v5e). Scanning the WHOLE block instead pays that
    boundary cost once per block: the dec1 res block measures
    19.9 → 14.6 ms/patch at sw_batch=8. Parameters are broadcast, so the
    tree is identical to the unscanned module.

    WFTPU_NO_BATCH_SCAN=1 bypasses the scan entirely (the folded paired
    conv path handles the batch in one dispatch — see `_Conv3dCore`);
    WFTPU_UNROLL_BATCH=1 unrolls the batch loop statically (same
    per-volume program, no scan slice/write-back; params shared because
    the same bound module instance is invoked per sample)."""
    from waveformer_tpu.models.common import _no_batch_scan, _unroll_batch

    if _no_batch_scan():
        return block(x)
    if _unroll_batch():
        b = jax.tree.leaves(x)[0].shape[0]
        outs = [
            block(jax.tree.map(lambda t: t[i:i + 1], x)) for i in range(b)
        ]
        return jnp.concatenate(outs, axis=0)
    scan = nn.scan(
        lambda mdl, carry, xi: (
            carry,
            mdl(jax.tree.map(lambda t: t[None], xi))[0],
        ),
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )
    _, y = scan(block, None, x)
    return y


class UnetrBasicBlock(nn.Module):
    """Skip-encoder block: UnetResBlock (res_block=True in the reference)."""

    out_channels: int
    kernel_size: int = 3
    res_block: bool = True
    cf_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        block = cls(
            self.out_channels,
            kernel_size=self.kernel_size,
            cf_in=self.cf_in,
            dtype=self.dtype,
            name="layer",
        )
        if x.shape[0] > 1:
            return _scan_over_batch(block, x)
        return block(x)


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
        # feed (up, skip) as a tuple: the res block consumes the pair as a
        # virtual concat (conv kernels sliced per part) — no 2×-channel
        # tensor is ever written
        h = (up, skip) if self.res_block else jnp.concatenate(
            [up, skip], axis=-1
        )
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        block = cls(
            self.out_channels,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="conv_block",
        )
        if up.shape[0] > 1:
            return _scan_over_batch(block, h)
        return block(h)


class UnetOutBlock(nn.Module):
    """1×1×1 conv head with bias. `cf_out=True` emits channels-first
    (B, O, D, H, W) logits directly from the head matmul — the
    channels-last O=4 logit tensor would be 32×-lane-padded."""

    out_channels: int
    cf_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv3d(
            self.out_channels,
            kernel_size=1,
            use_bias=True,
            dtype=self.dtype,
            cf_out=self.cf_out,
            name="conv",
        )(x)


class ProjectionHead(nn.Module):
    """Contrastive projection head (`network_models/network_backbone.py:35-63`).

    `proj='convmlp'` (reference default): 1³ conv → BatchNorm+ReLU
    (`lib/models/tools/module_helper.py:29-34`, `bn_type='torchbn'`) →
    1³ conv, then L2-normalisation over the channel axis. `proj='linear'`
    is a single 1³ conv (the reference uses Conv2d there — a 2D leftover
    that cannot run on its 3D tensors; we keep the useful 3D semantics).

    Off the reference train path (never instantiated by `Waveformer`), but
    part of its exported model surface; kept for checkpoint-key
    completeness on configs that enable contrastive projection.
    """

    dim_in: int
    proj_dim: int = 256
    proj: str = "convmlp"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.proj == "linear":
            h = Conv3d(
                self.proj_dim, kernel_size=1, dtype=self.dtype, name="proj"
            )(x)
        elif self.proj == "convmlp":
            h = Conv3d(
                self.dim_in, kernel_size=1, dtype=self.dtype, name="proj0"
            )(x)
            # torch BatchNorm3d defaults: eps 1e-5, momentum 0.1
            h = nn.BatchNorm(
                use_running_average=deterministic,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(h.astype(jnp.float32))
            h = nn.relu(h).astype(self.dtype)
            h = Conv3d(
                self.proj_dim, kernel_size=1, dtype=self.dtype, name="proj2"
            )(h)
        else:
            raise ValueError(f"Unknown projection type: {self.proj}")
        # F.normalize(p=2, dim=1): L2 over channels with torch's 1e-12 floor
        h32 = h.astype(jnp.float32)
        norm = jnp.maximum(
            jnp.linalg.norm(h32, axis=-1, keepdims=True), 1e-12
        )
        return (h32 / norm).astype(self.dtype)


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
