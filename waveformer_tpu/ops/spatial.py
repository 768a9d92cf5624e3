"""Grid pull/push resampling (TPU-native equivalent of MONAI's C++/CUDA
`resample/pushpull_*` extension, `monai/csrc/resample/*`).

`grid_pull` samples a channels-last volume at arbitrary coordinates
(trilinear, selectable bound mode); `grid_push` is its exact adjoint
(scatter-add splatting). They are linked through `jax.custom_vjp` exactly as
the reference's C++ backward does — the gradient of pull w.r.t. the volume is
a push of the output cotangent, and vice versa.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BOUND_MODES = ("zero", "clamp", "reflect")


def _apply_bound(idx: jax.Array, n: int, mode: str):
    """Map integer indices into range; returns (index, weight_mask)."""
    if mode == "zero":
        valid = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), valid.astype(jnp.float32)
    if mode == "clamp":
        return jnp.clip(idx, 0, n - 1), jnp.ones_like(idx, jnp.float32)
    if mode == "reflect":
        period = max(2 * n - 2, 1)
        r = jnp.mod(idx, period)
        r = jnp.where(r >= n, period - r, r)
        return r, jnp.ones_like(idx, jnp.float32)
    raise ValueError(f"unknown bound mode {mode!r}")


def _corner_terms(coords: jax.Array, shape: Tuple[int, int, int], bound: str):
    """8 (index, weight) corner pairs for trilinear interpolation.

    coords: (N, 3) float voxel coordinates. Returns lists of
    ((N,) flat index, (N,) weight).
    """
    d, h, w = shape
    c0 = jnp.floor(coords).astype(jnp.int32)
    frac = coords - c0
    terms = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                iz, mz = _apply_bound(c0[:, 0] + dz, d, bound)
                iy, my = _apply_bound(c0[:, 1] + dy, h, bound)
                ix, mx = _apply_bound(c0[:, 2] + dx, w, bound)
                wz = frac[:, 0] if dz else 1.0 - frac[:, 0]
                wy = frac[:, 1] if dy else 1.0 - frac[:, 1]
                wx = frac[:, 2] if dx else 1.0 - frac[:, 2]
                weight = wz * wy * wx * mz * my * mx
                flat = (iz * h + iy) * w + ix
                terms.append((flat, weight.astype(jnp.float32)))
    return terms


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_pull(volume: jax.Array, coords: jax.Array, bound: str = "zero"):
    """Sample `volume` (D, H, W, C) at `coords` (N, 3) → (N, C)."""
    return _pull_impl(volume, coords, bound)


def _pull_impl(volume, coords, bound):
    d, h, w, c = volume.shape
    flat_vol = volume.reshape(-1, c).astype(jnp.float32)
    out = jnp.zeros((coords.shape[0], c), jnp.float32)
    for flat, weight in _corner_terms(coords, (d, h, w), bound):
        out = out + weight[:, None] * flat_vol[flat]
    return out.astype(volume.dtype)


def _push_impl(values, coords, shape, bound):
    d, h, w = shape
    c = values.shape[-1]
    out = jnp.zeros((d * h * w, c), jnp.float32)
    v32 = values.astype(jnp.float32)
    for flat, weight in _corner_terms(coords, (d, h, w), bound):
        out = out.at[flat].add(weight[:, None] * v32)
    return out.reshape(d, h, w, c)


def grid_push(
    values: jax.Array,
    coords: jax.Array,
    shape: Tuple[int, int, int],
    bound: str = "zero",
):
    """Splat `values` (N, C) at `coords` (N, 3) into a (D, H, W, C) volume —
    the adjoint of `grid_pull`."""
    return _push_impl(values, coords, shape, bound)


def _pull_fwd(volume, coords, bound):
    return _pull_impl(volume, coords, bound), (volume, coords)


def _pull_bwd(bound, res, g):
    volume, coords = res
    # d/d volume: push the cotangent back through the same weights
    dvol = _push_impl(g, coords, volume.shape[:3], bound).astype(volume.dtype)
    # d/d coords via autodiff on the weights
    def sample_at(crd):
        return _pull_impl(volume, crd, bound)

    _, vjp = jax.vjp(sample_at, coords)
    (dcoords,) = vjp(g)
    return dvol, dcoords


grid_pull.defvjp(_pull_fwd, _pull_bwd)


def grid_count(coords: jax.Array, shape: Tuple[int, int, int],
               bound: str = "zero") -> jax.Array:
    """Splat unit weights (the reference extension's `count` op)."""
    ones = jnp.ones((coords.shape[0], 1), jnp.float32)
    return _push_impl(ones, coords, shape, bound)[..., 0]
