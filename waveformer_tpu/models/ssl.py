"""Self-supervised pretraining head (contrastive + reconstruction).

Equivalent of the reference `SSLViT` (`self_supervised/ssl_head.py:9-146`):
3D ViT encoder → (a) global-pooled linear contrastive projection,
(b) volumetric reconstruction decoder ("vae": conv+IN+LeakyReLU+2× trilinear
upsample pyramid; "deconv": stacked k2s2 transposed convs;
"large_kernel_deconv": one big transposed conv).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import Conv3d, ConvTranspose2x, instance_norm, leaky_relu
from waveformer_tpu.models.vit import ViT3D
from waveformer_tpu.ops.resize import resize_trilinear

Dtype = Any


class SSLViT(nn.Module):
    img_size: Tuple[int, int, int] = (96, 96, 96)
    patch_size: int = 16
    in_channels: int = 1
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    projection_size: int = 256
    dropout_rate: float = 0.0
    upsample_mode: str = "vae"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """(B, D, H, W, C) → (embeddings (B, P), recon (B, D, H, W, C))."""
        vit = ViT3D(
            img_size=self.img_size,
            patch_size=self.patch_size,
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="vit",
        )
        tokens = vit(x, deterministic)  # (B, N, hidden)
        gd, gh, gw = vit.grid
        feat = tokens.reshape(x.shape[0], gd, gh, gw, self.hidden_size)

        pooled = jnp.mean(tokens, axis=1)
        embeddings = nn.Dense(
            self.projection_size, dtype=self.dtype, name="proj_contrastive"
        )(pooled)

        h = feat
        hs = self.hidden_size
        # number of 2× stages required to reach the input resolution. The
        # reference decoder is hard-coded to 5 stages (32×,
        # `ssl_head.py:83-122`), which only reconstructs the input when
        # vit patch == 32; here the depth adapts to the actual patch size.
        p = self.patch_size
        stages = max(int(np.log2(p)), 1)
        if 2**stages != p:
            raise ValueError(
                f"patch_size {p} must be a power of two for the decoder"
            )
        chs = [max(hs >> (i + 1), 8) for i in range(stages)]
        if self.upsample_mode == "vae":
            for i, ch in enumerate(chs):
                h = Conv3d(ch, kernel_size=3, dtype=self.dtype,
                           name=f"dec_conv{i}")(h)
                h = leaky_relu(instance_norm(h.astype(jnp.float32))).astype(
                    self.dtype
                )
                h = resize_trilinear(
                    h, tuple(2 * s for s in h.shape[1:4]), align_corners=False
                )
            recon = Conv3d(self.in_channels, kernel_size=1, dtype=self.dtype,
                           name="dec_out")(h)
        elif self.upsample_mode == "deconv":
            for i, ch in enumerate(chs[:-1] + [self.in_channels]):
                h = ConvTranspose2x(ch, use_bias=True, dtype=self.dtype,
                                    name=f"dec_deconv{i}")(h)
            recon = h
        elif self.upsample_mode == "large_kernel_deconv":
            # one k=s=patch transposed conv == dense C→p³·out + depth-to-space
            b, gd_, gh_, gw_, c = h.shape
            out = nn.Dense(
                p * p * p * self.in_channels, dtype=self.dtype,
                name="dec_large",
            )(h)
            out = out.reshape(b, gd_, gh_, gw_, p, p, p, self.in_channels)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
            recon = out.reshape(
                b, gd_ * p, gh_ * p, gw_ * p, self.in_channels
            )
        else:
            raise ValueError(f"unknown upsample mode {self.upsample_mode!r}")
        return embeddings, recon
