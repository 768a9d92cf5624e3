"""Wavelet core parity tests.

Haar (`db1`, mode='zero') analysis/synthesis must match pywt/ptwt semantics
exactly (reference `network_models/wave_helper.py:343-353`). With no pywt in
the image, correctness is pinned by (a) hand-computed pairwise Haar values,
(b) perfect-reconstruction round trips, (c) directional-energy checks that
pin the subband-key ↔ axis convention, and (d) the generic FIR path
cross-checked against the fast Haar path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.ops import wavelet as wv


def _rand(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestHaar1Level:
    def test_pairwise_values(self, rng):
        x = _rand(rng, (1, 4, 4, 4, 1))
        ll, det = wv.dwt3(jnp.asarray(x))
        # lowpass = mean of each 2x2x2 block * 2**(3/2) / 2**3 = mean * sqrt(8)
        blocks = x.reshape(1, 2, 2, 2, 2, 2, 2, 1).transpose(0, 1, 3, 5, 2, 4, 6, 7)
        expect_ll = blocks.sum(axis=(4, 5, 6)) / (2 ** 1.5)
        np.testing.assert_allclose(np.asarray(ll), expect_ll, atol=1e-6)
        # full energy preservation (orthonormal transform)
        total = np.sum(np.asarray(ll) ** 2) + sum(
            np.sum(np.asarray(v) ** 2) for v in det.values()
        )
        np.testing.assert_allclose(total, np.sum(x**2), rtol=1e-5)

    def test_subband_axis_convention(self, rng):
        # signal varying ONLY along W ⇒ detail energy only in 'aad'
        x = np.zeros((1, 8, 8, 8, 1), dtype=np.float32)
        x[0, :, :, :, 0] = np.arange(8, dtype=np.float32)[None, None, :]
        _, det = wv.dwt3(jnp.asarray(x))
        assert np.abs(np.asarray(det["aad"])).max() > 0.1
        for k in ("ada", "add", "daa", "dad", "dda", "ddd"):
            np.testing.assert_allclose(np.asarray(det[k]), 0.0, atol=1e-6)
        # signal varying ONLY along D ⇒ detail energy only in 'daa'
        x = np.zeros((1, 8, 8, 8, 1), dtype=np.float32)
        x[0, :, :, :, 0] = np.arange(8, dtype=np.float32)[:, None, None]
        _, det = wv.dwt3(jnp.asarray(x))
        assert np.abs(np.asarray(det["daa"])).max() > 0.1
        for k in ("aad", "ada", "add", "dad", "dda", "ddd"):
            np.testing.assert_allclose(np.asarray(det[k]), 0.0, atol=1e-6)

    def test_roundtrip(self, rng):
        x = _rand(rng, (2, 16, 8, 12, 3))
        ll, det = wv.dwt3(jnp.asarray(x))
        rec = wv.idwt3(ll, det)
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-5)

    def test_odd_size_zero_padding(self, rng):
        # pywt mode='zero': odd N pairs the last sample with an implicit 0
        x = _rand(rng, (1, 5, 4, 4, 1))
        ll, det = wv.dwt3(jnp.asarray(x))
        assert ll.shape == (1, 3, 2, 2, 1)
        xp = np.concatenate([x, np.zeros((1, 1, 4, 4, 1), np.float32)], axis=1)
        ll2, _ = wv.dwt3(jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll2), atol=1e-6)


class TestMultiLevel:
    def test_wavedec_structure(self, rng):
        x = _rand(rng, (1, 32, 32, 32, 4))
        coeffs = wv.wavedec3(jnp.asarray(x), level=3)
        assert len(coeffs) == 4
        assert coeffs[0].shape == (1, 4, 4, 4, 4)  # coarsest lowpass
        assert coeffs[1]["ddd"].shape == (1, 4, 4, 4, 4)  # coarsest details
        assert coeffs[3]["ddd"].shape == (1, 16, 16, 16, 4)  # finest details

    def test_waverec_roundtrip(self, rng):
        x = _rand(rng, (2, 32, 32, 32, 2))
        coeffs = wv.wavedec3(jnp.asarray(x), level=3)
        rec = wv.waverec3(coeffs)
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-4)

    def test_decoder_style_mixed_resolution(self, rng):
        """Decoder reconstruction with a *replaced* lowpass (the model's use:
        conv output as LF + encoder HF coeffs, `idwt_upsample.py:159-160`)."""
        x = _rand(rng, (1, 16, 16, 16, 4))
        coeffs = wv.wavedec3(jnp.asarray(x), level=2)
        new_lf = jnp.ones_like(coeffs[0])
        rec = wv.waverec3([new_lf] + coeffs[1:])
        assert rec.shape == x.shape


class TestGenericPath:
    def test_generic_matches_haar(self, rng):
        x = _rand(rng, (1, 8, 8, 8, 2))
        ll_f, det_f = wv.dwt3(jnp.asarray(x))
        ll_g, det_g = wv._dwt3_generic(jnp.asarray(x), "db1", (1, 2, 3))
        np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_g), atol=1e-5)
        for k in wv.DETAIL_KEYS:
            np.testing.assert_allclose(
                np.asarray(det_f[k]), np.asarray(det_g[k]), atol=1e-5
            )

    def test_generic_idwt_roundtrip(self, rng):
        x = _rand(rng, (1, 8, 8, 8, 2))
        ll, det = wv._dwt3_generic(jnp.asarray(x), "db1", (1, 2, 3))
        rec = wv._idwt3_generic(ll, det, "db1", (1, 2, 3))
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-5)

    def test_unknown_wavelet_raises(self):
        with pytest.raises(ValueError):
            wv.dwt3(jnp.zeros((1, 4, 4, 4, 1)), wavelet="db9")


class TestTorchParity:
    """Cross-check against torch implementations written in-test (the image
    has CPU torch); pins sign/ordering conventions independently."""

    def test_haar_vs_torch_conv(self, rng):
        import torch
        import torch.nn.functional as F

        x = _rand(rng, (1, 8, 8, 8, 1))
        ll, det = wv.dwt3(jnp.asarray(x))
        # build the 8 analysis filters as strided conv3d, pywt convention
        lo = np.array([1, 1], np.float32) / np.sqrt(2)
        hi = np.array([1, -1], np.float32) / np.sqrt(2)  # applied to (x0, x1)
        xt = torch.from_numpy(x[..., 0]).unsqueeze(1)  # (1,1,8,8,8)
        for key, ref in [("aaa", ll)] + [(k, det[k]) for k in wv.DETAIL_KEYS]:
            fd = lo if key[0] == "a" else hi
            fh = lo if key[1] == "a" else hi
            fw = lo if key[2] == "a" else hi
            k3 = np.einsum("i,j,k->ijk", fd, fh, fw).astype(np.float32)
            w = torch.from_numpy(k3).reshape(1, 1, 2, 2, 2)
            out = F.conv3d(xt, w, stride=2)
            np.testing.assert_allclose(
                np.asarray(ref)[0, ..., 0], out[0, 0].numpy(), atol=1e-5
            )


class TestGoldenFixtures:
    """Committed golden coefficient fixtures (tests/fixtures/wavelet_*.npz,
    generated by tools/gen_wavelet_fixtures.py — pywt when available,
    torch-conv oracle otherwise). Pins `wavedec3` to the ptwt/pywt 'zero'
    convention the reference checkpoints assume
    (`wave_helper.py:343-353`), incl. odd extents and multi-level."""

    @pytest.mark.parametrize("fname", [
        "wavelet_db1_6x6x6_l1.npz",
        "wavelet_db1_7x9x5_l2.npz",
        "wavelet_db1_8x12x10_l2.npz",
    ])
    def test_wavedec3_matches_fixture(self, fname):
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures", fname)
        z = np.load(path)
        level = int(z["level"])
        x = z["x"]  # (C, D, H, W)
        xin = jnp.asarray(x.transpose(1, 2, 3, 0)[None])  # (1, D, H, W, C)
        coeffs = wv.wavedec3(xin, level=level)
        lf, details = coeffs[0], coeffs[1:]
        for c in range(x.shape[0]):
            np.testing.assert_allclose(
                np.asarray(lf)[0, ..., c], z[f"c{c}_lf"], atol=1e-5
            )
            for li, det in enumerate(details):
                for k in wv.DETAIL_KEYS:
                    np.testing.assert_allclose(
                        np.asarray(det[k])[0, ..., c],
                        z[f"c{c}_l{li}_{k}"], atol=1e-5,
                        err_msg=f"{fname} c{c} level{li} {k}",
                    )
