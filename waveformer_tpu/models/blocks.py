"""WaveFormer transformer block: DWT-compressed multi-scale window attention.

Equivalent of the reference `Block` (`network_models/wave_helper.py:357-549`).
The multi-scale forward (`wave_helper.py:470-512`) iteratively Haar-decomposes
the (pre-norm) features, runs *shared-weight* window attention on each
low-frequency grid, trilinearly upsamples every scale's output back to the
stage resolution and sums them; high-frequency coefficients accumulate and
are returned (coarsest-first) for the decoder's IDWT path.

Window size is `stage_grid / 2**level` — 8 at every stage for the BraTS
config, so the deepest scale is exactly one window (global attention over the
compressed grid). This is the paper's efficiency mechanism: attention cost is
divided by 8**level while the HF detail re-enters via the decoder.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveformer_tpu.models.attention import WindowAttention
from waveformer_tpu.models.common import DropPath
from waveformer_tpu.models.layers import CCF_FFN
from waveformer_tpu.ops.resize import resize_trilinear
from waveformer_tpu.ops.wavelet import dwt3, wavedec3
from waveformer_tpu.ops.window import window_partition, window_unpartition_flat

Dtype = Any
HFDetails = Dict[str, jax.Array]


class WaveFormerBlock(nn.Module):
    """One transformer block at a given stage.

    Returns `(x, hfs)` where `hfs` is a tuple of HF-detail dicts ordered
    coarsest-first (ready for `waverec3`), empty at level 0.
    """

    dim: int
    num_heads: int
    level: int
    img_size: Tuple[int, int, int]  # stage grid (post patch-embed/merging)
    mlp_ratio: float = 4.0
    ms_attention: bool = True
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, Tuple[HFDetails, ...]]:
        window_size = self.img_size[0] // (2**self.level)
        attn = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=window_size,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
            name="attn",
        )
        norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")
        mlp = CCF_FFN(
            hidden_features=int(self.dim * self.mlp_ratio),
            dtype=self.dtype,
            name="mlp",
        )
        drop_path = DropPath(self.drop_path, name="drop_path")

        shortcut = x
        h = norm1(x)

        hfs: List[HFDetails] = []
        if self.ms_attention:
            attn_fused = jnp.zeros_like(x)
            n_scales = max(self.level, 1)
            for _ in range(n_scales):
                if self.level > 0:
                    h, det = dwt3(h)
                    hfs.append(det)
                grid = h.shape[1:4]
                windows = window_partition(h, window_size)
                attn_w = attn(windows)
                attn_vol = window_unpartition_flat(attn_w, window_size, grid)
                if self.level > 0:
                    attn_fused = attn_fused + resize_trilinear(
                        attn_vol, self.img_size, align_corners=False
                    )
                else:
                    attn_fused = attn_fused + attn_vol
        else:
            # single-scale variant (`wave_helper.py:515-549`): one level-deep
            # DWT, attention once on the compressed grid.
            if self.level > 0:
                coeffs = wavedec3(h, level=self.level)
                h, hfs = coeffs[0], list(coeffs[1:])
            grid = h.shape[1:4]
            windows = window_partition(h, window_size)
            attn_w = attn(windows)
            attn_vol = window_unpartition_flat(attn_w, window_size, grid)
            if self.level > 0:
                attn_vol = resize_trilinear(
                    attn_vol, self.img_size, align_corners=False
                )
            attn_fused = attn_vol

        x = shortcut + drop_path(attn_fused, deterministic)
        x = x + drop_path(mlp(norm2(x)), deterministic)

        if self.level > 0:
            if self.ms_attention:
                # reference reverses the per-iteration list → coarsest first
                # (`wave_helper.py:511`)
                return x, tuple(reversed(hfs))
            return x, tuple(hfs)
        return x, ()
