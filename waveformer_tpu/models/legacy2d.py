"""2D token-sequence modules kept for reference-surface parity.

These four classes exist in the reference as dead code — no 3D WaveFormer
path constructs them (`network_models/wave_helper.py:86-110` DWConv,
`:302-341` Mlp, `:571-640` OverlapPatchEmbed, `:690-709` PosCNN; they are
PVT/SegFormer leftovers). They are provided here so a user migrating 2D
experiments built on the reference's helpers finds working equivalents.

Conventions: token sequences are (B, N, C) with N = H*W, matching the
reference's forward signatures. Internally the conv-based modules reshape
to (B, H, W, C) — channels-last NHWC so XLA tiles the convs onto the MXU
without layout copies.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import (
    gelu,
    he_fan_out_conv_init,
    trunc_normal_init,
)

Dtype = Any


def _tokens_to_image(x: jax.Array, h: int, w: int) -> jax.Array:
    """(B, N, C) -> (B, H, W, C) with N == H*W."""
    b, n, c = x.shape
    if n != h * w:
        raise ValueError(f"token count {n} != H*W = {h}*{w}")
    return x.reshape(b, h, w, c)


def _image_to_tokens(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H*W, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class Mlp2D(nn.Module):
    """Token MLP: fc1 -> GELU -> drop -> fc2 -> drop.

    Reference `wave_helper.py:302-341` (`Mlp`). The reference forward takes
    (x, H, W) but never uses H/W (that variant has no DWConv branch); we
    keep the token-level signature. Linear weights use trunc-normal(0.02)
    init as `_init_weights` there does.
    """

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        h = nn.Dense(
            hidden, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc1"
        )(x)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(
            out, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc2"
        )(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return h


class DWConv2D(nn.Module):
    """Depthwise 3x3 over a token sequence (reference `wave_helper.py:86-110`).

    (B, N, C) -> reshape to the (H, W) grid -> depthwise conv -> (B, N, C).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        c = x.shape[-1]
        img = _tokens_to_image(x, h, w)
        img = nn.Conv(
            c,
            kernel_size=(3, 3),
            padding=1,
            feature_group_count=c,
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="dwconv",
        )(img)
        return _image_to_tokens(img)


class OverlapPatchEmbed2D(nn.Module):
    """Overlapping patch embedding (reference `wave_helper.py:571-640`).

    Conv(k=patch_size, stride, pad=patch_size//2) -> flatten -> LayerNorm.
    Returns (tokens, H_out, W_out) exactly like the reference forward.
    """

    embed_dim: int = 768
    patch_size: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, int, int]:
        pad = self.patch_size // 2
        img = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="proj",
        )(x)
        h, w = img.shape[1], img.shape[2]
        tokens = _image_to_tokens(img)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tokens)
        return tokens, h, w


class PosCNN2D(nn.Module):
    """Conditional positional encoding (reference `wave_helper.py:690-709`).

    Depthwise 3x3 (stride s) -> GELU -> 1x1 conv, with a residual when
    s == 1, applied on the (H, W) grid of a token sequence.

    Note: the reference builds the first conv as
    ``nn.Conv2d(in_chans, embed_dim, 3, s, 1, groups=embed_dim)`` — i.e.
    grouped by *embed_dim*, which torch only accepts when
    in_chans == embed_dim (depthwise). We require that explicitly.
    """

    embed_dim: int = 768
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        c = x.shape[-1]
        if c != self.embed_dim:
            raise ValueError(
                "PosCNN2D requires in_chans == embed_dim "
                f"(got {c} != {self.embed_dim}); the reference's grouped conv "
                "is only constructible in that case"
            )
        img = _tokens_to_image(x, h, w)
        feat = nn.Conv(
            self.embed_dim,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            feature_group_count=self.embed_dim,
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="proj_dw",
        )(img)
        feat = gelu(feat)
        feat = nn.Conv(
            self.embed_dim,
            kernel_size=(1, 1),
            kernel_init=he_fan_out_conv_init,
            dtype=self.dtype,
            name="proj_pw",
        )(feat)
        if self.stride == 1:
            feat = feat + img
        return _image_to_tokens(feat)
