"""Trilinear resize parity vs torch.nn.functional.interpolate, and window ops."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from waveformer_tpu.ops.resize import resize_trilinear
from waveformer_tpu.ops.window import window_partition, window_unpartition


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((8, 8, 8), (16, 16, 16)), ((8, 8, 8), (32, 32, 32)), ((7, 5, 9), (13, 11, 4)),
     ((16, 16, 16), (8, 8, 8))],
)
def test_trilinear_matches_torch(rng, align_corners, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3)).astype(np.float32)
    got = resize_trilinear(jnp.asarray(x), out_size, align_corners=align_corners)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(
        xt, size=out_size, mode="trilinear", align_corners=align_corners
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_window_roundtrip(rng):
    x = rng.standard_normal((2, 16, 16, 16, 4)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 8)
    assert w.shape == (2 * 8, 512, 4)
    back = window_unpartition(w, 8, (16, 16, 16))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch_reference_order(rng):
    """Pin the exact permutation of the reference implementation
    (`wave_helper.py:450-461`)."""
    x = rng.standard_normal((1, 4, 4, 4, 2)).astype(np.float32)
    ws = 2
    xt = torch.from_numpy(x)
    b, d, h, w_, c = xt.shape
    v = xt.view(b, d // ws, ws, h // ws, ws, w_ // ws, ws, c)
    want = (
        v.permute(0, 1, 3, 5, 2, 4, 6, 7)
        .contiguous()
        .view(-1, ws * ws * ws, c)
        .numpy()
    )
    got = window_partition(jnp.asarray(x), ws)
    np.testing.assert_array_equal(np.asarray(got), want.reshape(-1, ws**3, c))
