"""IDWT decoder blocks (reference `network_models/idwt_upsample.py`)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.common import Conv3d, InstanceNormAffine
from waveformer_tpu.models.conv_blocks import UnetBasicBlock, UnetResBlock
from waveformer_tpu.ops.wavelet import waverec3

Dtype = Any


class HFRefinementRes(nn.Module):
    """Gated HF filtering before IDWT (`idwt_upsample.py:12-50`):
    dw3³conv → IN(affine) → ReLU → 1³conv → sigmoid, multiplied onto input."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        g = Conv3d(c, kernel_size=3, groups=c, dtype=self.dtype, name="conv1")(x)
        g = nn.relu(InstanceNormAffine(c, dtype=self.dtype, name="norm")(g))
        g = Conv3d(c, kernel_size=1, dtype=self.dtype, name="conv2")(g)
        return x * nn.sigmoid(g)


class UnetrIDWTBlock(nn.Module):
    """IDWT upsampling decoder block (`idwt_upsample.py:53-165`).

    conv3³ on the LF input → optional per-level HF refinement →
    `waverec3((lf,) + hf_coeffs)` → concat encoder skip → UnetRes/BasicBlock.

    `stage` = number of HF detail levels consumed (1/2/3 for
    decoder4/3/2, wired at `network_backbone.py:296-330`).
    """

    out_channels: int
    stage: int
    hf_refinement: bool = False
    wavelet: str = "db1"
    kernel_size: int = 3
    res_block: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inp: jax.Array,
        skip: jax.Array,
        hf_coeffs: Sequence[dict],
    ) -> jax.Array:
        lf = Conv3d(
            self.out_channels,
            kernel_size=self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv_lf",
        )(inp)

        if self.hf_refinement:
            refined = []
            for i, det in enumerate(hf_coeffs):
                ref = HFRefinementRes(
                    self.out_channels, dtype=self.dtype, name=f"hf_ref_{i}"
                )
                refined.append({k: ref(v) for k, v in det.items()})
            hf_coeffs = refined

        out = waverec3([lf] + list(hf_coeffs), wavelet=self.wavelet)
        out = jnp.concatenate([out, skip], axis=-1)
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        block = cls(
            self.out_channels,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="conv_block",
        )
        if out.shape[0] > 1:
            from waveformer_tpu.models.conv_blocks import _scan_over_batch

            return _scan_over_batch(block, out)
        return block(out)
