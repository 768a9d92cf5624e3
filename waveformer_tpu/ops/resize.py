"""Trilinear resampling that exactly matches `torch.nn.functional.interpolate`.

The reference model uses trilinear interpolation in two flavours:
  * `align_corners=False` (default) when fusing multi-scale attention outputs
    (`network_models/wave_helper.py:502,542`);
  * `align_corners=True` inside `ProjectionUpsample`
    (`network_models/wave_helper.py:43,65`).

TPU-first design: since all shapes are static, separable linear interpolation
is expressed as three small dense matrix contractions (one per spatial axis).
XLA maps these onto the MXU and fuses the surrounding elementwise work,
which is far faster than gather-based resampling on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(
    n_in: int, n_out: int, align_corners: bool
) -> np.ndarray:
    """(n_out, n_in) interpolation matrix replicating torch linear modes."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        if n_out == 1:
            m[0, 0] = 1.0
            return m
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int64), n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), w0.astype(np.float32))
    np.add.at(m, (rows, i1), w1.astype(np.float32))
    return m


def resize_trilinear(
    x: jax.Array,
    out_size: Sequence[int],
    align_corners: bool = False,
    axes: Tuple[int, int, int] = (1, 2, 3),
) -> jax.Array:
    """Resize the three spatial axes of `(B, D, H, W, C)` to `out_size`.

    Each axis contraction is an einsum whose output keeps the ORIGINAL dim
    order. (A tensordot+moveaxis formulation put the resized dim first and
    made XLA assign a batch-in-sublanes layout `{4,0,3,2,1}` to the result —
    which then propagated through every op of the consuming block; measured
    9× slowdown on the 1³ convs inside ProjectionUpsample.)"""
    letters = "bdhwc"
    for ax, n_out in zip(axes, out_size):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        mat = jnp.asarray(
            _linear_resize_matrix(n_in, int(n_out), align_corners), dtype=x.dtype
        )
        src = letters[: x.ndim]
        dst = src.replace(src[ax], "o", 1)
        sub = f"o{src[ax]},{src}->{dst}"
        x = jnp.einsum(sub, mat, x)
    return x
