"""3D Vision Transformer (encoder for SSL pretraining).

Capability match for the MONAI `ViT` used by the reference SSL head
(`self_supervised/ssl_head.py:54-66`; `monai/networks/nets/vit.py`):
convolutional patch embedding, learned positional embeddings, pre-LN
transformer blocks, no classification token. Channels-last, MXU-friendly
(patch embed as space-to-depth + dense).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import gelu, trunc_normal_init

Dtype = Any


class TransformerBlock(nn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, kernel_init=trunc_normal_init,
                     dtype=self.dtype, name="mlp_fc1")(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_size, kernel_init=trunc_normal_init,
                     dtype=self.dtype, name="mlp_fc2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x + h


class ViT3D(nn.Module):
    """(B, D, H, W, C) → token sequence (B, N, hidden) + grid shape."""

    img_size: Tuple[int, int, int] = (96, 96, 96)
    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def grid(self) -> Tuple[int, int, int]:
        return tuple(s // self.patch_size for s in self.img_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, d, h, w, c = x.shape
        p = self.patch_size
        # conv patch embed as space-to-depth + dense (one MXU matmul)
        x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, (d // p) * (h // p) * (w // p), p * p * p * c
        )
        x = nn.Dense(self.hidden_size, kernel_init=trunc_normal_init,
                     dtype=self.dtype, name="patch_embed")(x)
        pos = self.param(
            "pos_embed", trunc_normal_init, (1, x.shape[1], self.hidden_size)
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = TransformerBlock(
                hidden_size=self.hidden_size,
                mlp_dim=self.mlp_dim,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x
