"""Shared model primitives: norms, init, stochastic depth, conv helpers.

Torch-semantics notes (for checkpoint parity with the reference):
  * GELU is the exact erf form (`torch.nn.GELU` default) — JAX's default is
    the tanh approximation, so every call site here passes
    `approximate=False`.
  * InstanceNorm mirrors `torch.nn.InstanceNorm3d` defaults: eps 1e-5,
    **no affine**, per-(sample, channel) statistics over spatial dims.
  * LeakyReLU slope 0.01 (MONAI dynunet blocks,
    `monai/networks/blocks/dynunet_block.py:52`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torch nn.Conv3d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
torch_conv_default_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# reference transformer init (`waveformer.py:206-232`): trunc normal std .02 for
# dense, He-normal fan_out for convs
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def he_fan_out_conv_init(key, shape, dtype=jnp.float32):
    """normal(0, sqrt(2 / fan_out)), fan_out = prod(kernel) * out_ch."""
    receptive = int(np.prod(shape[:-2]))
    fan_out = receptive * shape[-1]
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, shape, dtype) * std


def _erf_poly(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7), fp32 in/out.

    XLA's builtin f32 erf lowers to a piecewise routine that resists
    fusion on TPU — measured 1.3 ms/patch PER GELU at 64³×384 (vs ~free
    for the tanh approximation). This single-path polynomial (one exp, one
    reciprocal, 5-term Horner) fuses like any elementwise op; its error is
    ~500× below bf16 resolution, so torch-parity tolerances are unaffected.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf-form) GELU — torch `nn.GELU()` semantics, TPU-fusable."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + _erf_poly(x32 * 0.7071067811865476))
    return y.astype(x.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm over spatial axes of (B, D, H, W, C), no affine."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNormAffine(nn.Module):
    """InstanceNorm3d(affine=True) equivalent (per-channel scale/bias)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = instance_norm(x.astype(jnp.float32), self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (y * scale + bias).astype(self.dtype)


class ChannelGroupNorm(nn.Module):
    """torch GroupNorm(num_groups=C, num_channels=C): per-channel norm over
    spatial dims with affine params (used by `ProjectionUpsample`,
    reference `wave_helper.py:60`)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = instance_norm(x.astype(jnp.float32), self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (y * scale + bias).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing channel axis (torch-compatible)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")
        return ln(x)


def layer_norm_stateless(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free F.layer_norm over the channel axis (reference
    `waveformer.py:197-203` proj_out)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, scale_by_keep=True)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


@functools.lru_cache(maxsize=None)
def _s2d_kernel_selector() -> np.ndarray:
    """(27 block-offset, 8 in-phase, 8 out-phase, 27 tap) 0/1 selector for
    expressing a stride-1 3³ conv as a 3³ conv over 2× space-to-depth
    blocks. Per axis: output voxel v = 2b+p reads input u = v + t − 1,
    which lives in block b + kb − 1 with kb = (p + t − 1)//2 + 1 and phase
    q = (p + t − 1) mod 2 — i.e. tap t = 2(kb − 1) + q − p + 1 when valid."""
    sel = np.zeros((27, 8, 8, 27), np.float32)
    for kb in np.ndindex(3, 3, 3):
        for q in np.ndindex(2, 2, 2):
            for p in np.ndindex(2, 2, 2):
                t = tuple(
                    2 * (kb[a] - 1) + q[a] - p[a] + 1 for a in range(3)
                )
                if all(0 <= v <= 2 for v in t):
                    kb_i = (kb[0] * 3 + kb[1]) * 3 + kb[2]
                    q_i = (q[0] * 2 + q[1]) * 2 + q[2]
                    p_i = (p[0] * 2 + p[1]) * 2 + p[2]
                    t_i = (t[0] * 3 + t[1]) * 3 + t[2]
                    sel[kb_i, q_i, p_i, t_i] = 1.0
    return sel


def _conv3_s2d(x_cf: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 'SAME' 3³ conv on a channels-FIRST (B, C, D, H, W) input
    with SMALL C, computed as one dense 3³ conv over 2× space-to-depth
    blocks: (B, D/2, H/2, W/2, 8C) × (3, 3, 3, 8C, 8O) → depth-to-space →
    (B, D, H, W, O) channels-last.

    Why: at C=4 the direct formulations are memory-bound disasters — the
    27-tap im2col stack materializes 27C channels (measured 4.4 ms/patch
    for enc0 @128³), and a channels-last C=4 tensor is 32×-lane-padded.
    The s2d form pays 8× the MACs (the expanded kernel is 12.5% dense) but
    runs them at full MXU lane utilization (8C=32 in, 8O=384 out), with no
    stacked intermediate. All spatial dims must be even."""
    b, c, d, h, w = x_cf.shape
    o = kernel.shape[-1]
    # s2d: phase-major channel order (pd, ph, pw, c)
    x2 = x_cf.reshape(b, c, d // 2, 2, h // 2, 2, w // 2, 2)
    x2 = x2.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    x2 = x2.reshape(b, d // 2, h // 2, w // 2, 8 * c)
    # expanded kernel: W2[kb, q·C+c, p·O+o] = Σ_t sel · W[t, c, o]
    sel = jnp.asarray(_s2d_kernel_selector(), x_cf.dtype)
    w2 = jnp.einsum(
        "kqpt,tcn->kqcpn", sel, kernel.reshape(27, c, o)
    ).reshape(3, 3, 3, 8 * c, 8 * o)
    out2 = jax.lax.conv_general_dilated(
        x2, w2, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    # depth-to-space back to (B, D, H, W, O)
    out = out2.reshape(b, d // 2, h // 2, w // 2, 2, 2, 2, o)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(b, d, h, w, o)


def _paired_conv_enabled() -> bool:
    """Paired-output W conv A/B gate (see `_pair_w_kernel`)."""
    import os

    return os.environ.get("WFTPU_PAIRED_CONV", "0") == "1"


def _pallas_dwconv_enabled() -> bool:
    """Pallas depthwise-stencil A/B gate (see `ops/dwconv_pallas.py`)."""
    import os

    return os.environ.get("WFTPU_PALLAS_DWCONV", "0") == "1"


def _no_batch_scan() -> bool:
    """A/B gate: bypass `_scan_over_batch` block scans and run convs with
    the batch folded into the 2D conv batch dim (only sensible together
    with WFTPU_PAIRED_CONV — unpaired folded convs measured 2× slower)."""
    import os

    return os.environ.get("WFTPU_NO_BATCH_SCAN", "0") == "1"


def _unroll_batch() -> bool:
    """A/B gate: statically unroll conv blocks over the batch instead of
    `lax.scan` — no dynamic-slice/update machinery and no scan-boundary
    layout conflicts; XLA sees B independent single-volume chains."""
    import os

    return os.environ.get("WFTPU_UNROLL_BATCH", "0") == "1"


def _kdg_conv_enabled() -> bool:
    """A/B gate: kd-grouped conv — the three depth taps of a 3³ conv as
    3·O output channels of ONE 2D conv (N = 144 lanes ⇒ 56% MXU lane
    utilization vs 48/128 = 37.5%) at identical MACs; the cross-slab
    combine becomes D-shifted slice adds that fuse into the consumer.
    Also deletes the D-padded input copy (edges handled in the adds)."""
    import os

    return os.environ.get("WFTPU_KDG_CONV", "0") == "1"


def _pair_w_kernel(kslc: jax.Array) -> jax.Array:
    """(3, 3, 3, C, O) → (3, 3, 4, C, 2O) paired-output kernel.

    Two adjacent W output positions are computed by ONE stride-(1,2)
    conv with kernel width 4 and doubled output channels: channel block
    j·O+o holds output position 2w+j of original channel o. Zero-padded
    taps make it exact: Wp[kd, kh, t+j, :, j·O+o] = W[kd, kh, t, :, o].
    """
    c, o = kslc.shape[-2:]
    z = jnp.zeros(kslc.shape[:2] + (1, c, o), kslc.dtype)
    w0 = jnp.concatenate([kslc, z], axis=2)  # output j=0 reads taps 0..2
    w1 = jnp.concatenate([z, kslc], axis=2)  # output j=1 reads taps 1..3
    return jnp.concatenate([w0, w1], axis=-1)


class _Conv3dCore(nn.Module):
    """Parameter-compatible conv core with a TPU-fast path.

    Dense 3×3×3 stride-1 convs lower poorly through XLA's 3D conv on TPU
    (27 small matmuls, ~12% MXU util at C≈48). Decomposing along the depth
    axis into three batched 2D convs measures 1.9× faster on v5e
    (11.5 → 6.0 ms for 48→48 @128³ bf16) and is numerically identical.
    Parameter layout is unchanged: kernel (kD, kH, kW, I/groups, O).

    When O < 128 lanes the conv's implicit GEMM runs at O/128 lane
    utilization; `_pair_w_kernel` trades 4/3 the MACs for 2× the lanes
    (net ~1.5× on the MXU) by emitting two adjacent W positions per
    conv step. Enabled for O ≤ 64 with even W (exact — same taps, same
    fp32 tap-sum order); override with WFTPU_PAIRED_CONV=0/1.

    `cf_in` / `cf_out`: consume/produce channels-FIRST tensors
    (B, C, D, H, W). TPU lane tiling pads the minor dim to 128, so a
    channels-last tensor with tiny C (the 4-channel model input, the
    4-logit output) is stored 32×-padded — every pass over it runs at
    ~3% of HBM speed. The channels-first paths contract via einsum without
    ever materializing a small-C-minor tensor. Parameters are identical
    to the channels-last path (checkpoint compatible).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    groups: int
    use_bias: bool
    kernel_init: Callable
    dtype: Dtype
    cf_in: bool = False
    cf_out: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.cf_in:
            return self._call_cf(x)
        # A TUPLE input means "convolve the channel-concatenation of these
        # parts" WITHOUT materializing the concat: the kernel is one
        # (k,k,k,ΣC,O) parameter applied in per-part slices whose partial
        # outputs sum in fp32 — algebraically identical to conv(concat),
        # parameter-compatible, and it deletes the concat's HBM round trip
        # + layout copies (traced ~3.8 ms/patch around dec1 at sw_batch=8).
        parts = x if isinstance(x, tuple) else (x,)
        if len(parts) > 1 and (self.groups != 1 or self.stride != 1):
            parts = (jnp.concatenate(parts, axis=-1),)
        cin = sum(p.shape[-1] for p in parts)
        offs = np.cumsum([0] + [p.shape[-1] for p in parts]).tolist()
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, cin // self.groups, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        kernel = kernel.astype(self.dtype)
        parts = tuple(p.astype(self.dtype) for p in parts)
        x = parts[0]
        if k == 1 and self.stride == 1 and self.groups == 1:
            # 1³ conv IS a channel matmul. XLA's conv lowering for k=1 picks
            # a batch-in-sublanes layout with 2.7× padding (observed: a
            # bf16[8,128³,48]{4,0,3,2,1} copy per skip conv at sw_batch=8,
            # 4 GB for a 1.5 GB tensor) — einsum avoids the conv op entirely.
            out = None
            for pi, p in enumerate(parts):
                term = jnp.einsum(
                    "...c,co->...o", p, kernel[0, 0, 0, offs[pi]: offs[pi + 1]]
                )
                out = term if out is None else out + term
            if bias is not None:
                out = out + bias.astype(self.dtype)
            if self.cf_out:
                out = out.transpose(0, 4, 1, 2, 3)
            return out
        fast = (
            k == 3
            and self.stride == 1
            and self.padding == 1
            and self.groups == 1
        )
        if (
            k == 3
            and self.stride == 1
            and self.padding == 1
            and self.groups == cin == self.features
            and len(parts) == 1
            and _pallas_dwconv_enabled()
        ):
            from waveformer_tpu.ops import dwconv_pallas as dp

            if (
                dp.supported(*x.shape[1:])
                and jax.default_backend() == "tpu"
            ):
                out = dp.dwconv3(x, kernel[:, :, :, 0, :])
                if bias is not None:
                    out = out + bias.astype(self.dtype)
                if self.cf_out:
                    out = out.transpose(0, 4, 1, 2, 3)
                return out
        # NOTE on depthwise convs: a 27-tap shifted-multiply stencil improves
        # the batch-1 forward (103 → 91.5 ms) but regresses the sw_batch=8
        # sliding-window program by 35% (tap intermediates at batch 8 spill);
        # XLA's grouped-conv lowering is kept — revisit with a Pallas
        # stencil kernel that keeps taps in VMEM.
        # NOTE: no `preferred_element_type` here — a widened conv output has
        # no transpose rule against narrow inputs, which breaks the backward
        # pass under bf16 training. The MXU accumulates in fp32 internally
        # either way; the cross-tap sum below is done in fp32 explicitly.
        if fast:
            paired = (
                self.features <= 64
                and x.shape[3] % 2 == 0
                and _paired_conv_enabled()
            )

            kdg = _kdg_conv_enabled() and not paired

            def one_volume(vols):  # tuple of (D, H, W, Ci) → (D, H, W, O)
                acc = None
                for pi, vol in enumerate(vols):
                    d, h, wd, _ = vol.shape
                    kslc = kernel[:, :, :, offs[pi]: offs[pi + 1]]
                    if kdg:
                        # kd-grouped: ONE 2D conv with 3·O channels (56%
                        # lane util vs 37.5%), cross-slab combine as
                        # D-shifted fp32 adds (kd-ordered — bit-identical
                        # to the kd-loop below for single-part inputs; for
                        # tuple inputs only the fp32 add association with
                        # the previous part differs), D edges by zero rows
                        # instead of a padded input copy.
                        o = self.features
                        kg = jnp.concatenate(
                            [kslc[0], kslc[1], kslc[2]], axis=-1
                        )
                        p = jax.lax.conv_general_dilated(
                            vol, kg, (1, 1), [(1, 1), (1, 1)],
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        )
                        z = jnp.zeros((1, h, wd, o), jnp.float32)
                        part = (
                            jnp.concatenate(
                                [z, p[:-1, ..., 0:o].astype(jnp.float32)],
                                axis=0,
                            )
                            + p[..., o:2 * o].astype(jnp.float32)
                            + jnp.concatenate(
                                [p[1:, ..., 2 * o:3 * o].astype(jnp.float32),
                                 z],
                                axis=0,
                            )
                        )
                        acc = part if acc is None else acc + part
                        continue
                    if paired:
                        vp = jnp.pad(vol, ((1, 1), (0, 0), (1, 1), (0, 0)))
                        kp = _pair_w_kernel(kslc)
                        strides, pads = (1, 2), [(1, 1), (0, 0)]
                    else:
                        vp = jnp.pad(vol, ((1, 1), (0, 0), (0, 0), (0, 0)))
                        kp = kslc
                        strides, pads = (1, 1), [(1, 1), (1, 1)]
                    for kd in range(3):
                        part = jax.lax.conv_general_dilated(
                            vp[kd : kd + d],
                            kp[kd],
                            strides,
                            pads,
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ).astype(jnp.float32)
                        acc = part if acc is None else acc + part
                out = acc.astype(self.dtype)
                if paired:  # (D, H, W/2, 2O) → interleave → (D, H, W, O)
                    out = out.reshape(d, h, wd // 2, 2, self.features)
                    out = out.reshape(d, h, wd, self.features)
                return out

            if x.shape[0] == 1:
                out = one_volume(tuple(p[0] for p in parts))[None]
            elif paired and _no_batch_scan():
                # B·D-folded paired conv: one dispatch for the whole batch,
                # no lax.map / block-scan boundary copies
                b, d, h, wd, _ = x.shape
                acc = None
                for pi, p in enumerate(parts):
                    kp = _pair_w_kernel(
                        kernel[:, :, :, offs[pi]: offs[pi + 1]]
                    )
                    vp = jnp.pad(
                        p, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0))
                    )
                    for kd in range(3):
                        flat = vp[:, kd : kd + d].reshape(
                            b * d, h, wd + 2, p.shape[-1]
                        )
                        term = jax.lax.conv_general_dilated(
                            flat,
                            kp[kd],
                            (1, 2),
                            [(1, 1), (0, 0)],
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ).astype(jnp.float32)
                        acc = term if acc is None else acc + term
                out = acc.astype(self.dtype).reshape(
                    b, d, h, wd // 2, 2, self.features
                ).reshape(b, d, h, wd, self.features)
            else:
                # lax.map keeps XLA's single-volume fusion (measured 12.2 vs
                # 17.8 ms for two 48→48 convs @128³ vs flattening the batch
                # into the conv batch dim)
                out = jax.lax.map(one_volume, parts)
        else:
            if len(parts) > 1:
                x = jnp.concatenate(parts, axis=-1)
            out = jax.lax.conv_general_dilated(
                x,
                kernel,
                (self.stride,) * 3,
                [(self.padding, self.padding)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=self.groups,
            ).astype(self.dtype)
        if bias is not None:
            out = out + bias.astype(self.dtype)
        if self.cf_out:
            out = out.transpose(0, 4, 1, 2, 3)
        return out

    def _call_cf(self, x):
        """Channels-first input (B, C, D, H, W): no small-C-minor
        materialization. k=3 runs as a space-to-depth conv (see
        `_conv3_s2d`); k=1 is an einsum."""
        k = self.kernel_size
        cin = x.shape[1]
        if self.groups != 1 or self.stride != 1 or k not in (1, 3):
            raise NotImplementedError("cf_in supports dense k∈{1,3}, stride 1")
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, k, cin, self.features)
        ).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        if k == 1:
            out = jnp.einsum(
                "bcdhw,co->bdhwo" if not self.cf_out else "bcdhw,co->bodhw",
                x,
                kernel[0, 0, 0],
            )
        else:
            # 27-tap stacked einsum. Measured alternatives @128³ B=8 (r3):
            # the space-to-depth conv (`_conv3_s2d`) is 3.2 vs 4.4 ms/patch
            # standalone but XLA materializes a 32×-lane-padded copy of the
            # input (4 GB at B=8) that OOMs the full model; a (D,H,C,W)
            # tap-dot ties this formulation; B·D-folded 2D convs are 2×
            # slower (batch-in-sublane padded copies).
            b, c, d, h, w = x.shape
            paired = (
                self.features <= 64
                and w % 2 == 0
                and not self.cf_out
                and _paired_conv_enabled()
            )
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
            if paired:
                # 36 taps at W-stride 2 → (B, D, H, W/2, 2O) → interleave.
                # vs the 27-tap stack: 2/3 the stacked bytes, 2× the GEMM
                # lanes at 4/3 the MACs (see `_pair_w_kernel`).
                taps = [
                    xp[:, :, kd : kd + d, kh : kh + h, kw : kw + w : 2]
                    for kd in range(3)
                    for kh in range(3)
                    for kw in range(4)
                ]
                stacked = jnp.concatenate(taps, axis=1)  # (B, 36·C, D, H, W/2)
                kp = _pair_w_kernel(kernel)  # (3, 3, 4, C, 2O)
                out2 = jnp.einsum(
                    "bkdhw,ko->bdhwo",
                    stacked,
                    kp.reshape(36 * cin, 2 * self.features),
                )
                out = out2.reshape(b, d, h, w, self.features)
            else:
                taps = [
                    xp[:, :, kd : kd + d, kh : kh + h, kw : kw + w]
                    for kd in range(3)
                    for kh in range(3)
                    for kw in range(3)
                ]
                stacked = jnp.concatenate(taps, axis=1)  # (B, 27·C, D, H, W)
                out = jnp.einsum(
                    "bkdhw,ko->bdhwo" if not self.cf_out else "bkdhw,ko->bodhw",
                    stacked,
                    kernel.reshape(k * k * k * cin, self.features),
                )
        if bias is not None:
            bshape = (
                (1, 1, 1, 1, -1) if not self.cf_out else (1, -1, 1, 1, 1)
            )
            out = out + bias.astype(self.dtype).reshape(bshape)
        return out.astype(self.dtype)


class Conv3d(nn.Module):
    """Channels-last 3D conv with torch-compatible geometry."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # None → torch 'same-for-odd-k' padding
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_default_init
    dtype: Dtype = jnp.float32
    cf_in: bool = False
    cf_out: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else (k - self.stride + 1) // 2
        return _Conv3dCore(
            features=self.features,
            kernel_size=k,
            stride=self.stride,
            padding=pad,
            groups=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            cf_in=self.cf_in,
            cf_out=self.cf_out,
            name="conv",
        )(x)


class ConvTranspose2x(nn.Module):
    """Transposed conv with kernel=stride=2 (MONAI `UnetrUpBlock.transp_conv`,
    `monai/networks/blocks/dynunet_block.py:216-228` geometry).

    With kernel == stride the op is exactly: dense C→8·O followed by a
    depth-to-space interleave — a single MXU matmul instead of a scatter,
    which is the TPU-native formulation.
    """

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        o = self.features
        # kernel laid out as (C_in, 2, 2, 2, O) == torch convT (I, O, kD, kH, kW)
        # permuted; converter handles the mapping.
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (c, 2, 2, 2, o),
        )
        y = jnp.einsum(
            "bdhwc,cijko->bdihjwko",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
        )
        y = y.reshape(b, 2 * d, 2 * h, 2 * w, o)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,))
            y = y + bias.astype(self.dtype)
        return y


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding (MONAI `PatchEmbed`,
    `monai/networks/blocks/patchembedding.py:147-225`, patch_norm=False).

    Conv k=p=s is expressed as space-to-depth + dense: the canonical
    MXU-friendly stem on TPU.
    """

    embed_dim: int
    patch_size: int = 2
    dtype: Dtype = jnp.float32
    cf_in: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        if self.cf_in:
            # (B, C, D, H, W) input: identical feature order (pd, ph, pw, c)
            # without ever materializing a small-C-minor tensor
            b, c, d, h, w = x.shape
            x = x.reshape(b, c, d // p, p, h // p, p, w // p, p)
            x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
            x = x.reshape(b, d // p, h // p, w // p, p * p * p * c)
        else:
            b, d, h, w, c = x.shape
            x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            x = x.reshape(b, d // p, h // p, w // p, p * p * p * c)
        dense = nn.Dense(
            self.embed_dim,
            use_bias=True,
            kernel_init=torch_conv_default_init,
            dtype=self.dtype,
            name="proj",
        )
        return dense(x)
