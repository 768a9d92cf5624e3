"""SSL stack tests: ViT, SSL head, NT-Xent, augment ops, short train run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.models.ssl import SSLViT
from waveformer_tpu.models.vit import ViT3D
from waveformer_tpu.training.ssl import (
    SSLTrainer,
    aug_rand,
    augment_context_restoration,
    nt_xent,
    patch_rand_drop,
    rot_rand,
    ssl_total_loss,
)


class TestViT:
    def test_token_shape(self, rng):
        m = ViT3D(img_size=(32, 32, 32), patch_size=8, hidden_size=64,
                  mlp_dim=128, num_layers=2, num_heads=4)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 64, 64)  # 4³ tokens × hidden 64


class TestSSLHead:
    @pytest.mark.parametrize("mode", ["vae", "deconv", "large_kernel_deconv"])
    def test_recon_matches_input_shape(self, rng, mode):
        """Decoder depth adapts to vit patch size: reconstruction is always
        at the input resolution (unlike the reference's fixed-32× decoder)."""
        m = SSLViT(
            img_size=(32, 32, 32), patch_size=8,
            in_channels=2, hidden_size=32, mlp_dim=64, num_layers=1,
            num_heads=2, projection_size=16, upsample_mode=mode,
        )
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        emb, rec = m.apply(params, x)
        assert emb.shape == (1, 16)
        assert rec.shape == x.shape


class TestNTXent:
    def test_matches_torch_reference_formula(self, rng):
        import torch
        import torch.nn.functional as F

        b, d = 4, 8
        x1 = rng.standard_normal((b, d)).astype(np.float32)
        x2 = rng.standard_normal((b, d)).astype(np.float32)
        got = float(nt_xent(jnp.asarray(x1), jnp.asarray(x2), 0.5))

        z_i = F.normalize(torch.from_numpy(x1), dim=1)
        z_j = F.normalize(torch.from_numpy(x2), dim=1)
        z = torch.cat([z_i, z_j], dim=0)
        sim = F.cosine_similarity(z.unsqueeze(1), z.unsqueeze(0), dim=2)
        pos = torch.cat([torch.diag(sim, b), torch.diag(sim, -b)])
        mask = (~torch.eye(2 * b, dtype=bool)).float()
        nom = torch.exp(pos / 0.5)
        denom = mask * torch.exp(sim / 0.5)
        want = float(torch.sum(-torch.log(nom / torch.sum(denom, dim=1))) / (2 * b))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_identical_views_lower_than_random(self, rng):
        z = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        z2 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        assert float(nt_xent(z, z)) < float(nt_xent(z, z2))

    def test_total_loss_combination(self, rng):
        c = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 1)), jnp.float32)
        total, parts = ssl_total_loss(c, c, r, r, r, r)
        # perfect recon → recon 0 → total 0 regardless of contrast
        np.testing.assert_allclose(float(total), 0.0, atol=1e-6)
        assert float(parts["recon"]) == 0.0


class TestAugmentOps:
    def test_patch_rand_drop_changes_content(self, rng):
        x = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
        out = patch_rand_drop(x, rng=np.random.RandomState(0))
        assert out.shape == x.shape
        assert np.abs(out - x).max() > 0

    def test_rot_rand_labels_match(self, rng):
        x = rng.standard_normal((3, 1, 8, 8, 8)).astype(np.float32)
        out, labels = rot_rand(x, np.random.RandomState(1))
        for i, k in enumerate(labels):
            np.testing.assert_array_equal(
                out[i], np.rot90(x[i], int(k), axes=(2, 3))
            )

    def test_aug_rand_shape(self, rng):
        x = rng.standard_normal((2, 1, 12, 12, 12)).astype(np.float32)
        out = aug_rand(x, np.random.RandomState(0))
        assert out.shape == x.shape

    def test_context_restoration_preserves_histogram(self, rng):
        x = rng.standard_normal((1, 20, 20, 20)).astype(np.float32)
        out = augment_context_restoration(x, rng=np.random.RandomState(0))
        # swapping patches permutes voxels: sorted values identical
        np.testing.assert_allclose(
            np.sort(out.ravel()), np.sort(x.ravel()), atol=1e-6
        )
        assert np.abs(out - x).max() > 0


class TestSSLTrainer:
    @pytest.mark.slow
    def test_short_run_loss_finite_and_checkpoints(self, tmp_path, rng):
        model = SSLViT(
            img_size=(16, 16, 16), patch_size=8, in_channels=1,
            hidden_size=32, mlp_dim=64, num_layers=1, num_heads=2,
            projection_size=8, upsample_mode="large_kernel_deconv",
        )
        # large_kernel_deconv at patch 8: dense to 32³ blocks ≠ img; use
        # deconv-compatible config instead: grid 2, 2·2⁵ = 64 ≠ 16 — so use
        # large kernel with patch 16? grid 1 → 1·32=32 ≠16. Simplest: vae on
        # img 32 wouldn't match either. The reference has the same geometry
        # constraint (decoder scale fixed at 32×). Use patch 16, img 16? grid
        # 1, large kernel 32 → 32³. For the smoke run, just compare shapes
        # loosely via an upsample-mode that matches: deconv needs patch 32.
        model = SSLViT(
            img_size=(32, 32, 32), patch_size=32, in_channels=1,
            hidden_size=32, mlp_dim=64, num_layers=1, num_heads=2,
            projection_size=8, upsample_mode="deconv",
        )
        trainer = SSLTrainer(
            model, num_steps=3, batch_size=2, lr=1e-3, warmup_steps=1,
            eval_every=2, logdir=str(tmp_path), seed=0,
        )
        batches = [
            rng.standard_normal((2, 32, 32, 32, 1)).astype(np.float32)
            for _ in range(4)
        ]
        val = [batches[-1]]
        best = trainer.train(iter(batches), val)
        assert np.isfinite(best)
        import glob

        assert glob.glob(str(tmp_path / "model" / "final_model_*"))
