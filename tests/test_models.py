"""Numerical tests for the TPU-shaped conv/activation formulations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.models.common import Conv3d, _conv3_s2d, gelu


class TestSpaceToDepthConv:
    """`_conv3_s2d`: stride-1 3³ conv over 2× s2d blocks == direct conv."""

    @pytest.mark.parametrize(
        "shape,cin,cout",
        [((2, 4, 12, 10, 8), 4, 48), ((1, 2, 6, 6, 6), 2, 5),
         ((3, 1, 4, 8, 6), 1, 7)],
    )
    def test_matches_direct_conv(self, shape, cin, cout):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        k = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32
        )
        ref = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 3, 4, 1), k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = _conv3_s2d(x, k)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_cf_conv_even_and_odd_grids_agree(self):
        """Conv3d(cf_in) takes the s2d path on even grids and the tap-stack
        path on odd ones — both must equal the channels-last conv."""
        rng = np.random.default_rng(1)
        for spatial in [(8, 8, 8), (7, 9, 5)]:
            x_cf = jnp.asarray(
                rng.standard_normal((2, 4, *spatial)), jnp.float32
            )
            mod_cf = Conv3d(10, kernel_size=3, use_bias=True, cf_in=True)
            params = mod_cf.init(jax.random.PRNGKey(0), x_cf)
            out_cf = mod_cf.apply(params, x_cf)

            mod_cl = Conv3d(10, kernel_size=3, use_bias=True)
            out_cl = mod_cl.apply(params, x_cf.transpose(0, 2, 3, 4, 1))
            np.testing.assert_allclose(out_cf, out_cl, atol=1e-4)


class TestPairedWConv:
    """WFTPU_PAIRED_CONV=1: paired-output W conv == the unpaired fast path
    (exact — the kernel zero-pad keeps taps and fp32 sum order identical)."""

    def test_matches_unpaired(self, monkeypatch):
        rng = np.random.default_rng(2)
        # batch 1 (inline path), batch >1 (lax.map path), odd H, O=64 gate
        for shape, cout in [((1, 6, 8, 12, 6), 4), ((3, 4, 7, 10, 5), 64)]:
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            mod = Conv3d(cout, kernel_size=3, use_bias=True)
            params = mod.init(jax.random.PRNGKey(0), x)
            monkeypatch.setenv("WFTPU_PAIRED_CONV", "0")
            base = mod.apply(params, x)
            monkeypatch.setenv("WFTPU_PAIRED_CONV", "1")
            paired = mod.apply(params, x)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(paired))

    def test_cf_stacked_path_matches(self, monkeypatch):
        rng = np.random.default_rng(4)
        x_cf = jnp.asarray(rng.standard_normal((2, 4, 7, 9, 8)), jnp.float32)
        mod = Conv3d(10, kernel_size=3, use_bias=True, cf_in=True)
        params = mod.init(jax.random.PRNGKey(0), x_cf)
        monkeypatch.setenv("WFTPU_PAIRED_CONV", "0")
        base = mod.apply(params, x_cf)
        monkeypatch.setenv("WFTPU_PAIRED_CONV", "1")
        paired = mod.apply(params, x_cf)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(paired))

    def test_folded_batch_matches_scan(self, monkeypatch):
        """WFTPU_NO_BATCH_SCAN=1 + paired: B·D-folded convs == the
        scan-over-batch path (fp32 tolerance — IN stats reorder)."""
        from waveformer_tpu.models.conv_blocks import UnetrBasicBlock

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((3, 6, 8, 12, 6)), jnp.float32)
        mod = UnetrBasicBlock(16)
        params = mod.init(jax.random.PRNGKey(0), x)
        base = mod.apply(params, x)
        monkeypatch.setenv("WFTPU_PAIRED_CONV", "1")
        monkeypatch.setenv("WFTPU_NO_BATCH_SCAN", "1")
        folded = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(folded), atol=2e-5
        )

    def test_odd_w_falls_back(self, monkeypatch):
        monkeypatch.setenv("WFTPU_PAIRED_CONV", "1")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 7, 4)), jnp.float32)
        mod = Conv3d(8, kernel_size=3)
        params = mod.init(jax.random.PRNGKey(0), x)
        assert mod.apply(params, x).shape == (1, 6, 6, 7, 8)


class TestGelu:
    def test_matches_torch_exact_gelu(self):
        import torch

        x = np.linspace(-8, 8, 20001).astype(np.float32)
        ours = np.asarray(gelu(jnp.asarray(x)))
        ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        # A&S 7.1.26 polynomial: |err| ~1e-6 on the erf scale — far below
        # the 2e-4 parity budget and bf16 resolution
        assert np.abs(ours - ref).max() < 5e-6
