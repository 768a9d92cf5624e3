"""3D window partition / unpartition for windowed attention.

Equivalent of the reference's `Block.window_partition`
(`network_models/wave_helper.py:450-461`) and its inverse reshape at
`wave_helper.py:498-499`, in channels-last layout. Pure reshape/transpose —
XLA lowers these to layout changes with no compute.
"""

from __future__ import annotations

import jax


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, D, H, W, C) → (B * nW, window_size**3, C)."""
    b, d, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, d // ws, ws, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws * ws * ws, c)


def window_unpartition(
    windows: jax.Array, window_size: int, grid: tuple[int, int, int]
) -> jax.Array:
    """(B * nW, window_size**3, C) → (B, D, H, W, C). True inverse of
    `window_partition`."""
    d, h, w = grid
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((d // ws) * (h // ws) * (w // ws))
    x = windows.reshape(b, d // ws, h // ws, w // ws, ws, ws, ws, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


def window_unpartition_flat(
    windows: jax.Array, window_size: int, grid: tuple[int, int, int]
) -> jax.Array:
    """Reference-compatible window merge (`wave_helper.py:498-499`).

    The reference reshapes `(B, nW, ws, ws, ws, C)` row-major straight into
    `(B, D, H, W, C)` — which is NOT the inverse of its window partition when
    nW > 1: spatial positions land scrambled. Released checkpoints were
    trained with exactly this mapping, so the model replicates it (identical
    to the true inverse when nW == 1, i.e. the deepest DWT scale).
    """
    d, h, w = grid
    ws = window_size
    c = windows.shape[-1]
    n_windows = (d // ws) * (h // ws) * (w // ws)
    b = windows.shape[0] // n_windows
    return windows.reshape(b, d, h, w, c)
