"""Sliding-window engine parity vs vendored MONAI + invariants."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.inference.sliding_window import (
    SlidingWindowInferer,
    bucket_shape,
    compute_importance_map,
    count_map,
    dense_patch_starts,
    sliding_window_inference,
)

REF = os.path.isdir("/root/reference")


class TestGrid:
    def test_single_patch(self):
        s = dense_patch_starts((16, 16, 16), (16, 16, 16), 0.5)
        np.testing.assert_array_equal(s, [[0, 0, 0]])

    def test_end_alignment(self):
        s = dense_patch_starts((20, 16, 16), (16, 16, 16), 0.5)
        np.testing.assert_array_equal(s[:, 0], [0, 4])

    @pytest.mark.skipif(not REF, reason="reference not mounted")
    def test_matches_monai_dense_patch_slices(self):
        import sys

        sys.path.insert(0, "/root/reference")
        from monai.data.utils import dense_patch_slices

        for shape in [(37, 41, 16), (16, 16, 16), (48, 33, 20)]:
            want = dense_patch_slices(shape, (16, 16, 16), (8, 8, 8))
            got = dense_patch_starts(shape, (16, 16, 16), 0.5)
            want_starts = np.asarray(
                [[sl.start for sl in p] for p in want], np.int32
            )
            np.testing.assert_array_equal(got, want_starts)


class TestImportanceMap:
    @pytest.mark.skipif(not REF, reason="reference not mounted")
    def test_matches_monai_gaussian(self):
        import sys

        sys.path.insert(0, "/root/reference")
        from monai.data.utils import compute_importance_map as monai_imp

        want = monai_imp((16, 16, 16), mode="gaussian").numpy()
        got = compute_importance_map((16, 16, 16))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_constant(self):
        np.testing.assert_array_equal(
            compute_importance_map((4, 4, 4), "constant"), np.ones((4, 4, 4))
        )


class TestSlidingWindow:
    def _identity_predictor(self, out_channels):
        # logits = input channel replicated: blending of a linear function of
        # the input must reproduce that function exactly after count divide
        def predictor(patches):
            return jnp.repeat(patches[..., :1], out_channels, axis=-1)

        return predictor

    def test_identity_blend_exact(self, rng):
        vol = jnp.asarray(rng.standard_normal((24, 24, 24, 2)), jnp.float32)
        out = sliding_window_inference(
            vol, self._identity_predictor(3), (16, 16, 16), 3, 0.5, 2
        )
        want = np.repeat(np.asarray(vol)[..., :1], 3, axis=-1)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)

    def test_mirror_tta_of_symmetric_predictor_unchanged(self, rng):
        vol = jnp.asarray(rng.standard_normal((16, 16, 16, 1)), jnp.float32)
        pred = self._identity_predictor(2)
        base = sliding_window_inference(vol, pred, (16, 16, 16), 2)
        tta = sliding_window_inference(
            vol, pred, (16, 16, 16), 2, mirror_axes=(0, 1, 2)
        )
        np.testing.assert_allclose(np.asarray(base), np.asarray(tta), atol=1e-5)

    def test_mirror_tta_asymmetric_grid_exact(self, rng):
        """Asymmetric patch grid (count map not mirror-symmetric): the
        per-orientation blend must still reconstruct a linear predictor
        exactly — guards the divide-before-average TTA semantics."""
        vol = jnp.asarray(rng.standard_normal((23, 16, 16, 1)), jnp.float32)
        out = sliding_window_inference(
            vol, self._identity_predictor(2), (16, 16, 16), 2,
            overlap=0.5, sw_batch_size=2, mirror_axes=(0, 1, 2),
        )
        want = np.repeat(np.asarray(vol), 2, axis=-1)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)

    @pytest.mark.skipif(not REF, reason="reference not mounted")
    def test_matches_monai_sliding_window(self, rng):
        """Same conv predictor in torch & jax; blended outputs must agree
        (volume sized so no bucket padding occurs)."""
        import sys

        sys.path.insert(0, "/root/reference")
        import torch

        from monai.inferers import sliding_window_inference as monai_swi

        kernel = rng.standard_normal((3, 2, 3, 3, 3)).astype(np.float32) * 0.2

        def jax_pred(patches):  # (B, d, h, w, 2) -> (B, d, h, w, 3)
            k = jnp.asarray(kernel.transpose(2, 3, 4, 1, 0))
            return jax.lax.conv_general_dilated(
                patches, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def torch_pred(x):  # (B, 2, d, h, w) -> (B, 3, d, h, w)
            return torch.nn.functional.conv3d(
                x, torch.from_numpy(kernel), padding=1
            )

        vol = rng.standard_normal((24, 24, 24, 2)).astype(np.float32)
        got = sliding_window_inference(
            jnp.asarray(vol), jax_pred, (16, 16, 16), 3,
            overlap=0.5, sw_batch_size=2,
        )
        with torch.no_grad():
            want = monai_swi(
                torch.from_numpy(vol.transpose(3, 0, 1, 2))[None],
                roi_size=(16, 16, 16),
                sw_batch_size=2,
                predictor=torch_pred,
                overlap=0.5,
                mode="gaussian",
            )[0].numpy().transpose(1, 2, 3, 0)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_inferer_class_bucket_padding(self, rng):
        """Odd case shape → bucketed executable, output cropped to original."""
        inferer = SlidingWindowInferer((16, 16, 16), sw_batch_size=2)
        vol = rng.standard_normal((19, 25, 17, 2)).astype(np.float32)
        out = inferer(vol, self._identity_predictor(2), out_channels=2)
        assert out.shape == (19, 25, 17, 2)
        # one compiled program reused for a second case in the same bucket
        vol2 = rng.standard_normal((20, 26, 18, 2)).astype(np.float32)
        out2 = inferer(vol2, self._identity_predictor(2), out_channels=2)
        assert bucket_shape((19, 25, 17), (16,) * 3, 0.5) == bucket_shape(
            (20, 26, 18), (16,) * 3, 0.5
        )
        assert out2.shape == (20, 26, 18, 2)

    def test_count_map_positive(self):
        cm = count_map((24, 24, 24), (16, 16, 16), 0.5)
        assert (cm > 0).all()


class TestPatchLevelTTA:
    def test_patch_tta_equals_volume_tta_on_symmetric_grid(self, rng):
        """tta_mode='patch' must be algebraically identical to the volume
        path when the grid is mirror-symmetric."""
        kernel = rng.standard_normal((3, 2, 3, 3, 3)).astype(np.float32) * 0.2

        def jax_pred(patches):
            k = jnp.asarray(kernel.transpose(2, 3, 4, 1, 0))
            return jax.lax.conv_general_dilated(
                patches, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        vol = jnp.asarray(rng.standard_normal((24, 24, 24, 2)), jnp.float32)
        a = sliding_window_inference(
            vol, jax_pred, (16, 16, 16), 3, mirror_axes=(0, 1, 2),
            tta_mode="volume",
        )
        b = sliding_window_inference(
            vol, jax_pred, (16, 16, 16), 3, mirror_axes=(0, 1, 2),
            tta_mode="patch",
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_patch_tta_equals_volume_tta_channels_first(self, rng):
        """Same equivalence on the channels-first stitch (the TPU default
        pipeline layout)."""
        kernel = rng.standard_normal((3, 2, 3, 3, 3)).astype(np.float32) * 0.2

        def jax_pred_cf(patches):  # (B, C, *roi) -> (B, 3, *roi)
            k = jnp.asarray(kernel.transpose(2, 3, 4, 1, 0))
            return jax.lax.conv_general_dilated(
                patches, k, (1, 1, 1), "SAME",
                dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
            )

        vol = jnp.asarray(rng.standard_normal((2, 24, 24, 24)), jnp.float32)
        a = sliding_window_inference(
            vol, jax_pred_cf, (16, 16, 16), 3, mirror_axes=(0, 1, 2),
            tta_mode="volume", layout="channels_first",
        )
        b = sliding_window_inference(
            vol, jax_pred_cf, (16, 16, 16), 3, mirror_axes=(0, 1, 2),
            tta_mode="patch", layout="channels_first",
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestChannelsFirstLayout:
    """channels-first stitch + io_layout model must match channels-last
    bit-for-bit (same compute, different storage layout)."""

    def test_cf_inference_matches_cl(self, rng):
        import jax
        import jax.numpy as jnp

        from waveformer_tpu.inference.sliding_window import (
            sliding_window_inference,
        )

        def fake_model_cl(patches):  # (B, *roi, C) -> (B, *roi, 2)
            a = patches.sum(-1, keepdims=True)
            return jnp.concatenate([a, -a], -1)

        def fake_model_cf(patches):  # (B, C, *roi) -> (B, 2, *roi)
            a = patches.sum(1, keepdims=True)
            return jnp.concatenate([a, -a], 1)

        vol = jnp.asarray(rng.standard_normal((24, 24, 24, 3)), jnp.float32)
        ref = sliding_window_inference(
            vol, fake_model_cl, (16, 16, 16), 2, overlap=0.5,
            sw_batch_size=4, mirror_axes=(0, 1, 2),
        )
        got = sliding_window_inference(
            vol.transpose(3, 0, 1, 2), fake_model_cf, (16, 16, 16), 2,
            overlap=0.5, sw_batch_size=4, mirror_axes=(0, 1, 2),
            layout="channels_first",
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(1, 2, 3, 0), np.asarray(ref),
            atol=1e-5, rtol=1e-5,
        )

    def test_cf_model_predict_case(self, rng):
        import jax
        import jax.numpy as jnp

        from waveformer_tpu.inference import Predictor, SlidingWindowInferer
        from waveformer_tpu.models import create_waveformer

        net = dict(in_chans=2, out_chans=3, img_size=(16, 16, 16),
                   patch_size=2, embed_dims=(4, 8, 16, 32),
                   num_heads=(1, 2, 4, 4), depths=(1, 1, 1, 1),
                   decom_levels=(3, 2, 1, 0), drop_path_rate=0.0)
        m_cl = create_waveformer(net)
        m_cf = create_waveformer(net, io_layout="channels_first")
        vol = rng.standard_normal((20, 22, 18, 2)).astype(np.float32)
        params = m_cl.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 16, 2)))
        props = {"shape_after_cropping_before_resample": (20, 22, 18),
                 "shape_before_cropping": (30, 30, 30),
                 "bbox_used_for_cropping": [[2, 22], [1, 23], [6, 24]]}
        p_cl = Predictor(SlidingWindowInferer((16,) * 3, sw_batch_size=4,
                                              overlap=0.25))
        seg_cl = p_cl.predict_case(
            vol, lambda p: m_cl.apply(params, p), 3, properties=props)
        p_cf = Predictor(SlidingWindowInferer((16,) * 3, sw_batch_size=4,
                                              overlap=0.25,
                                              layout="channels_first"))
        seg_cf = p_cf.predict_case(
            vol.transpose(3, 0, 1, 2), lambda p: m_cf.apply(params, p), 3,
            properties=props)
        assert seg_cl.shape == seg_cf.shape == (30, 30, 30)
        # identical compute in different layouts: identical labels
        assert (seg_cl == seg_cf).mean() > 0.999
