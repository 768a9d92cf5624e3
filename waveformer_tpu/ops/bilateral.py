"""Bilateral filtering (TPU-native equivalent of MONAI's C++/CUDA extension).

Capability match for `monai/csrc/filtering/bilateral/*` (+ the trainable
variants) exposed through `monai/networks/layers/filtering.py`. Instead of a
permutohedral lattice, the TPU formulation is a truncated-window bilateral
sum expressed as static shifted adds — every term is an elementwise
VPU op that XLA fuses; there is no gather/scatter.

The whole computation is differentiable in `x`, `spatial_sigma` and
`color_sigma`, which covers the reference's "trainable bilateral" capability
without a hand-written backward kernel.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _shift(x: jax.Array, offset: Sequence[int]) -> jax.Array:
    """Shift spatial axes (1..3) with zero fill."""
    for ax, o in enumerate(offset, start=1):
        if o == 0:
            continue
        x = jnp.roll(x, o, axis=ax)
        idx = [slice(None)] * x.ndim
        if o > 0:
            idx[ax] = slice(0, o)
        else:
            idx[ax] = slice(x.shape[ax] + o, x.shape[ax])
        x = x.at[tuple(idx)].set(0.0)
    return x


def bilateral_filter(
    x: jax.Array,
    spatial_sigma: float | jax.Array = 1.0,
    color_sigma: float | jax.Array = 0.5,
    truncate: float = 2.0,
    radius: int | None = None,
) -> jax.Array:
    """Channels-last bilateral filter of `(B, D, H, W, C)`.

    y[p] = Σ_o G_s(o) · G_r(x[p+o] − x[p]) · x[p+o]  /  Σ_o (weights)
    with offsets |o|∞ ≤ radius (default ceil(truncate·spatial_sigma); pass
    `radius` explicitly when `spatial_sigma` is a traced/learnable value —
    the window extent must be static under jit).
    """
    if radius is None:
        if not isinstance(spatial_sigma, (int, float)):
            raise ValueError(
                "pass an explicit `radius` when spatial_sigma is a traced "
                "array — the window extent must be static under jit"
            )
        radius = max(int(math.ceil(truncate * spatial_sigma)), 1)
    offsets = list(
        itertools.product(range(-radius, radius + 1), repeat=3)
    )
    ss2 = 2.0 * jnp.asarray(spatial_sigma, jnp.float32) ** 2
    cs2 = 2.0 * jnp.asarray(color_sigma, jnp.float32) ** 2

    x32 = x.astype(jnp.float32)
    num = jnp.zeros_like(x32)
    den = jnp.zeros_like(x32)
    for off in offsets:
        d2 = float(sum(o * o for o in off))
        ws = jnp.exp(-d2 / ss2)
        xo = _shift(x32, off)
        # color distance per channel
        wr = jnp.exp(-((xo - x32) ** 2) / cs2)
        w = ws * wr
        num = num + w * xo
        den = den + w
    return (num / jnp.maximum(den, 1e-8)).astype(x.dtype)


class TrainableBilateralFilter:
    """Differentiable bilateral filter with learnable sigmas
    (capability of `monai/csrc/filtering/trainable_bilateral/*`)."""

    def __init__(self, spatial_sigma: float = 1.0, color_sigma: float = 0.5,
                 truncate: float = 2.0):
        self.radius = max(int(math.ceil(truncate * spatial_sigma)), 1)
        self.params = {
            "spatial_sigma": jnp.asarray(spatial_sigma, jnp.float32),
            "color_sigma": jnp.asarray(color_sigma, jnp.float32),
        }

    def __call__(self, params, x):
        return bilateral_filter(
            x,
            spatial_sigma=jnp.maximum(params["spatial_sigma"], 1e-3),
            color_sigma=jnp.maximum(params["color_sigma"], 1e-3),
            radius=self.radius,
        )


def joint_bilateral_filter(
    x: jax.Array,
    guide: jax.Array,
    spatial_sigma: float = 1.0,
    color_sigma: float = 0.5,
    truncate: float = 2.0,
) -> jax.Array:
    """Joint/cross bilateral: range weights from a guide image
    (capability of `trainable_joint_bilateral/*`)."""
    radius = max(int(math.ceil(truncate * spatial_sigma)), 1)
    offsets = list(itertools.product(range(-radius, radius + 1), repeat=3))
    ss2 = 2.0 * spatial_sigma**2
    cs2 = 2.0 * color_sigma**2
    x32 = x.astype(jnp.float32)
    g32 = guide.astype(jnp.float32)
    num = jnp.zeros_like(x32)
    den = jnp.zeros_like(x32)
    for off in offsets:
        d2 = float(sum(o * o for o in off))
        ws = math.exp(-d2 / ss2)
        xo = _shift(x32, off)
        go = _shift(g32, off)
        wr = jnp.exp(
            -jnp.sum((go - g32) ** 2, axis=-1, keepdims=True) / cs2
        )
        w = ws * wr
        num = num + w * xo
        den = den + w
    return (num / jnp.maximum(den, 1e-8)).astype(x.dtype)
