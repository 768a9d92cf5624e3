"""Model assembly tests: shapes, parameter count, component semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.models import Waveformer, MultiscaleTransformer, create_waveformer
from waveformer_tpu.models.attention import WindowAttention, relative_position_index


SMALL = dict(
    img_size=(32, 32, 32),
    patch_size=2,
    in_chans=2,
    out_chans=3,
    embed_dims=(8, 16, 32, 64),
    depths=(1, 1, 1, 1),
    num_heads=(2, 4, 8, 8),
    decom_levels=(3, 2, 1, 0),
    drop_path_rate=0.0,
)


class TestRelPosIndex:
    def test_reference_quirk_strides(self):
        """Replicates `attention.py:40-57` exactly (verified vs torch)."""
        import torch

        ws = 4
        coords = torch.stack(
            torch.meshgrid(
                [torch.arange(ws), torch.arange(ws), torch.arange(ws)],
                indexing="ij",
            )
        )
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 2] += ws - 1
        rel[:, :, 0] *= 3 * ws - 1
        rel[:, :, 1] *= 2 * ws - 1
        want = rel.sum(-1).numpy()
        got = relative_position_index(ws)
        np.testing.assert_array_equal(got, want)

    def test_index_in_table_bounds(self):
        for ws in (4, 8):
            idx = relative_position_index(ws)
            assert idx.min() >= 0
            assert idx.max() < (2 * ws - 1) ** 3


class TestAttention:
    def test_shapes_and_determinism(self, rng):
        m = WindowAttention(dim=16, num_heads=4, window_size=4)
        x = jnp.asarray(rng.standard_normal((6, 64, 16)), dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(params, x)
        y2 = m.apply(params, x)
        assert y1.shape == (6, 64, 16)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_softmax_rows_change_with_bias(self, rng):
        """Bias table actually reaches the logits."""
        m = WindowAttention(dim=8, num_heads=2, window_size=2)
        x = jnp.asarray(rng.standard_normal((1, 8, 8)), dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(params, x)
        import flax

        flat = flax.traverse_util.flatten_dict(params)
        for k in list(flat):
            if "relative_position_bias_table" in k:
                key = jax.random.PRNGKey(7)
                flat[k] = jax.random.normal(key, flat[k].shape) * 3.0
        p2 = flax.traverse_util.unflatten_dict(flat)
        y1 = m.apply(p2, x)
        assert np.abs(np.asarray(y1 - y0)).max() > 1e-4


class TestEncoder:
    @pytest.mark.slow
    def test_stage_shapes_and_hf(self, rng):
        m = MultiscaleTransformer(
            img_size=(32, 32, 32),
            in_chans=2,
            embed_dims=(8, 16, 32, 64),
            num_heads=(2, 4, 8, 8),
            depths=(1, 1, 1, 1),
            decom_levels=(3, 2, 1, 0),
        )
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        outs, outs_hf = m.apply(params, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 16, 8),
            (1, 8, 8, 8, 16),
            (1, 4, 4, 4, 32),
            (1, 2, 2, 2, 64),
        ]
        # stage 1 level 3: three HF dicts, coarsest (2³) first
        assert len(outs_hf[0]) == 3
        assert outs_hf[0][0]["ddd"].shape == (1, 2, 2, 2, 8)
        assert outs_hf[0][2]["ddd"].shape == (1, 8, 8, 8, 8)
        # stage 3 level 1: one dict at 2³
        assert len(outs_hf[2]) == 1
        assert outs_hf[2][0]["ddd"].shape == (1, 2, 2, 2, 32)


class TestWaveformer:
    @pytest.mark.slow
    def test_forward_shape(self, rng):
        m = Waveformer(**SMALL)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 32, 32, 32, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_param_count_matches_reference(self):
        """Full BraTS config must land at exactly the reference's parameter
        count. The torch reference instantiated with the `config.yaml`
        hyperparameters has 17,167,546 trainable params (measured; the paper
        table's 16.97 M corresponds to a slightly different variant)."""
        m = Waveformer()  # defaults = BraTS config
        params = jax.eval_shape(
            lambda: m.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 128, 128, 128, 4), jnp.float32),
            )
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert n == 17_167_546, f"param count {n}"

    def test_create_waveformer_from_config(self):
        from waveformer_tpu.config import NetworkConfig

        cfg = NetworkConfig()
        m = create_waveformer(cfg.model_kwargs())
        assert m.embed_dims == (48, 96, 192, 384)
        assert m.qkv_bias is True

    @pytest.mark.slow
    def test_drop_path_training_mode_stochastic(self, rng):
        m = Waveformer(**{**SMALL, "drop_path_rate": 0.5})
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(
            params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        y2 = m.apply(
            params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        assert np.abs(np.asarray(y1 - y2)).max() > 1e-5

    @pytest.mark.slow
    def test_hf_refinement_variant(self, rng):
        m = Waveformer(**{**SMALL, "hf_refinement": True})
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 32, 32, 32, 3)

    def test_single_scale_variant(self, rng):
        m = Waveformer(**{**SMALL, "multi_scale_attention": False})
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 32, 32, 32, 3)

    def test_deep_supervision_outputs(self, rng):
        """Multi-scale aux heads + the deep-supervision loss wire together."""
        import jax.numpy as jnp

        from waveformer_tpu.training.losses import (
            deep_supervision_loss,
            dice_ce_loss,
        )

        m = Waveformer(**{**SMALL, "deep_supervision": True})
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(params, x)
        assert [o.shape for o in outs] == [
            (1, 32, 32, 32, 3),
            (1, 16, 16, 16, 3),
            (1, 8, 8, 8, 3),
        ]
        seg = jnp.zeros((1, 32, 32, 32, 1), jnp.int32)
        segs = [seg, seg[:, ::2, ::2, ::2], seg[:, ::4, ::4, ::4]]
        loss = deep_supervision_loss(dice_ce_loss, outs, segs)
        assert np.isfinite(float(loss))
