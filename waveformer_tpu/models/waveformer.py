"""The WaveFormer model: multiscale DWT-attention encoder + IDWT decoder.

Equivalents: `MultiscaleTransformer` (`network_models/waveformer.py:36-334`)
and `Waveformer` (`network_models/network_backbone.py:131-407`,
`create_waveformer` `:410-431`).

TPU-first: channels-last layout throughout, static shapes, bf16 compute with
fp32 params/normalization by default. Optional `use_checkpoint` wraps each
stage in `jax.checkpoint` (rematerialization) to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from waveformer_tpu.models.blocks import WaveFormerBlock
from waveformer_tpu.models.common import PatchEmbed, layer_norm_stateless
from waveformer_tpu.models.conv_blocks import (
    ChannelCalibration,
    UnetOutBlock,
    UnetrBasicBlock,
    UnetrUpBlock,
)
from waveformer_tpu.models.decoder import UnetrIDWTBlock
from waveformer_tpu.models.layers import PatchMerging, ProjectionUpsample

Dtype = Any


class MultiscaleTransformer(nn.Module):
    """4-stage DWT/window-attention encoder (`waveformer.py:36-334`).

    Input `(B, D, H, W, C_in)` channels-last. Returns `(outs, outs_hf)`:
    per-stage features (LN-projected, channels-last) and per-stage HF
    coefficient tuples (stages with level > 0).
    """

    img_size: Tuple[int, int, int] = (128, 128, 128)
    patch_size: int = 2
    in_chans: int = 4
    embed_dims: Tuple[int, ...] = (48, 96, 192, 384)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    decom_levels: Tuple[int, ...] = (3, 2, 1, 0)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    multi_scale_attention: bool = True
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    use_checkpoint: bool = False
    cf_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True, normalize: bool = True
    ):
        n_stages = len(self.depths)
        # stochastic-depth decay (`waveformer.py:94`)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()

        h = PatchEmbed(
            embed_dim=self.embed_dims[0],
            patch_size=self.patch_size,
            dtype=self.dtype,
            cf_in=self.cf_in,
            name="patch_embed",
        )(x)

        outs: List[jax.Array] = []
        outs_hf: List[Tuple] = []
        cur = 0
        for s in range(n_stages):
            stage_grid = tuple(
                d // (self.patch_size * (2**s)) for d in self.img_size
            )
            x_h: Tuple = ()
            # rematerialize each block under grad when use_checkpoint is set:
            # trades recompute for HBM (the TPU analog of torch
            # `use_checkpoint`, `network_backbone.py:150`)
            block_cls = (
                nn.remat(WaveFormerBlock, static_argnums=(2,))
                if self.use_checkpoint
                else WaveFormerBlock
            )
            for b in range(self.depths[s]):
                blk = block_cls(
                    dim=self.embed_dims[s],
                    num_heads=self.num_heads[s],
                    level=self.decom_levels[s],
                    img_size=stage_grid,
                    mlp_ratio=self.mlp_ratios[s],
                    ms_attention=self.multi_scale_attention,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop_path=dpr[cur + b],
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )
                h, x_h = blk(h, deterministic)
            cur += self.depths[s]
            out = layer_norm_stateless(h) if normalize else h
            outs.append(out)
            if s < n_stages - 1:
                outs_hf.append(x_h)
                h = PatchMerging(
                    dim=self.embed_dims[s],
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"downsample_{s + 1}",
                )(h)
        return outs, outs_hf


class Waveformer(nn.Module):
    """U-shaped WaveFormer segmentation network
    (`network_backbone.py:131-407`)."""

    img_size: Tuple[int, int, int] = (128, 128, 128)
    patch_size: int = 2
    in_chans: int = 4
    out_chans: int = 4
    embed_dims: Tuple[int, ...] = (48, 96, 192, 384)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    decom_levels: Tuple[int, ...] = (3, 2, 1, 0)
    multi_scale_attention: bool = True
    hf_refinement: bool = False
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.1
    norm_eps: float = 1e-6
    res_block: bool = True
    use_checkpoint: bool = False
    deep_supervision: bool = False
    io_layout: str = "channels_last"  # or "channels_first"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in: jax.Array, deterministic: bool = True):
        """(B, D, H, W, C_in) → logits (B, D, H, W, out_chans).

        With `io_layout="channels_first"`, input and logits are
        (B, C, D, H, W) instead: TPU lane tiling pads a minor dim to 128,
        so the 4-channel input / 4-logit output are stored 32×-padded in
        the channels-last layout — the channels-first boundary keeps both
        ends of the network at full HBM speed (internals stay
        channels-last, where C ≥ 48). Parameters are identical.

        With `deep_supervision=True` (training-time option; the reference
        ships the wrapper unused, `light_training/loss/deepsupervision.py`),
        returns a list of logits at full / half / quarter resolution —
        pair with `training.losses.deep_supervision_loss`.
        """
        cf = self.io_layout == "channels_first"
        fs = self.embed_dims
        # With use_checkpoint, rematerialize the full-resolution conv path
        # too (not just the encoder blocks): at 128³ the enc0 / decoder1 /
        # IDWT-decoder activations dominate HBM during backward — encoder
        # stage activations are 8-64× smaller. Parameter names/shapes are
        # unchanged (nn.remat is a lifted transform).
        if self.use_checkpoint:
            basic_cls = nn.remat(UnetrBasicBlock)
            idwt_cls = nn.remat(UnetrIDWTBlock)
            up_cls = nn.remat(UnetrUpBlock)
            proj_up_cls = nn.remat(ProjectionUpsample)
        else:
            basic_cls = UnetrBasicBlock
            idwt_cls = UnetrIDWTBlock
            up_cls = UnetrUpBlock
            proj_up_cls = ProjectionUpsample
        outs, outs_hf = MultiscaleTransformer(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dims=fs,
            num_heads=self.num_heads,
            mlp_ratios=self.mlp_ratios,
            decom_levels=self.decom_levels,
            depths=self.depths,
            multi_scale_attention=self.multi_scale_attention,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_path_rate=self.drop_path_rate,
            norm_eps=self.norm_eps,
            use_checkpoint=self.use_checkpoint,
            cf_in=cf,
            dtype=self.dtype,
            name="waveformer_encoder",
        )(x_in, deterministic)

        enc0 = basic_cls(
            fs[0], res_block=self.res_block, cf_in=cf, dtype=self.dtype,
            name="encoder1"
        )(x_in)
        enc1 = basic_cls(
            fs[0], res_block=self.res_block, dtype=self.dtype, name="encoder2"
        )(outs[0])
        enc2 = basic_cls(
            fs[1], res_block=self.res_block, dtype=self.dtype, name="encoder3"
        )(outs[1])
        enc3 = basic_cls(
            fs[2], res_block=self.res_block, dtype=self.dtype, name="encoder4"
        )(outs[2])

        dec5 = ChannelCalibration(
            fs[3], reduction_ratio=4, dtype=self.dtype, name="encoder10"
        )(outs[3])

        dec4 = idwt_cls(
            fs[2],
            stage=1,
            hf_refinement=self.hf_refinement,
            res_block=self.res_block,
            dtype=self.dtype,
            name="decoder4",
        )(dec5, enc3, outs_hf[-1])
        dec3 = idwt_cls(
            fs[1],
            stage=2,
            hf_refinement=self.hf_refinement,
            res_block=self.res_block,
            dtype=self.dtype,
            name="decoder3",
        )(dec5, enc2, outs_hf[-2])
        dec2 = idwt_cls(
            fs[0],
            stage=3,
            hf_refinement=self.hf_refinement,
            res_block=self.res_block,
            dtype=self.dtype,
            name="decoder2",
        )(dec5, enc1, outs_hf[-3])

        dec4_up = proj_up_cls(
            fs[2],
            fs[0],
            stride=4,
            residual=True,
            use_double_conv=True,
            dtype=self.dtype,
            name="learnable_up4",
        )(dec4)
        dec3_up = proj_up_cls(
            fs[1],
            fs[0],
            stride=2,
            residual=True,
            dtype=self.dtype,
            name="learnable_up3",
        )(dec3)

        combined = jnp.concatenate([dec4_up, dec3_up, dec2], axis=-1)
        dec1 = up_cls(
            fs[0], res_block=self.res_block, dtype=self.dtype, name="decoder1"
        )(combined, enc0)
        logits = UnetOutBlock(
            self.out_chans, cf_out=cf, dtype=self.dtype, name="out"
        )(dec1)
        if not self.deep_supervision:
            return logits
        # auxiliary heads at 1/2 (the fused 64³ features) and 1/4 (dec3)
        aux1 = UnetOutBlock(
            self.out_chans, cf_out=cf, dtype=self.dtype, name="ds_out1"
        )(dec2)
        aux2 = UnetOutBlock(
            self.out_chans, cf_out=cf, dtype=self.dtype, name="ds_out2"
        )(dec3)
        return [logits, aux1, aux2]


def create_waveformer(
    network_config: Optional[Dict[str, Any]] = None,
    dtype: Dtype = jnp.float32,
    **overrides,
) -> Waveformer:
    """Build a `Waveformer` from a config mapping (reference
    `network_backbone.py:410-431` equivalent). Accepts either the
    `NetworkConfig.model_kwargs()` dict or explicit keyword overrides."""
    kwargs: Dict[str, Any] = {}
    if network_config:
        kwargs.update(network_config)
    kwargs.update(overrides)
    kwargs.setdefault("dtype", dtype)
    valid = set(Waveformer.__dataclass_fields__)  # type: ignore[attr-defined]
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    for key in (
        "img_size",
        "embed_dims",
        "depths",
        "num_heads",
        "mlp_ratios",
        "decom_levels",
    ):
        if key in kwargs and isinstance(kwargs[key], list):
            kwargs[key] = tuple(kwargs[key])
    return Waveformer(**kwargs)
