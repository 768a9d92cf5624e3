"""Pallas implicit-GEMM conv: parity vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.ops.conv_pallas import conv3x3x3_batched, conv3x3x3_same


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


class TestConvPallas:
    @pytest.mark.parametrize("shape,cin,cout", [
        ((8, 8, 16, 4), 4, 8),
        ((4, 16, 8, 6), 6, 5),
    ])
    def test_matches_lax_conv(self, rng, shape, cin, cout):
        d, h, w_, _ = shape
        x = jnp.asarray(rng.standard_normal((d, h, w_, cin)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
        )
        got = conv3x3x3_same(x, w, block_h=4, interpret=True)
        want = _ref_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_batched(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 3)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)) * 0.2, jnp.float32)
        got = conv3x3x3_batched(x, w, block_h=4, interpret=True)
        want = jax.vmap(lambda v: _ref_conv(v, w))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_indivisible_h_raises(self, rng):
        x = jnp.zeros((4, 6, 8, 3))
        w = jnp.zeros((3, 3, 3, 3, 4))
        with pytest.raises(ValueError):
            conv3x3x3_same(x, w, block_h=4, interpret=True)


class TestConvPallasV2:
    @pytest.mark.parametrize("shape,cin,cout", [
        ((8, 8, 16, 4), 4, 8),
        ((4, 16, 8, 6), 6, 5),
    ])
    def test_cw_layout_matches_lax(self, rng, shape, cin, cout):
        from waveformer_tpu.ops.conv_pallas import conv3x3x3_same_v2

        d, h, w_, _ = shape
        x = jnp.asarray(rng.standard_normal((d, h, w_, cin)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
        )
        got = conv3x3x3_same_v2(x, w, block_h=4, interpret=True)
        want = _ref_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
