"""Losses, schedules, optimizer step, and multi-device training tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.training.losses import (
    deep_supervision_loss,
    deep_supervision_weights,
    dice_ce_loss,
    soft_dice_loss,
    softmax_cross_entropy,
    topk_cross_entropy,
)
from waveformer_tpu.training.schedules import make_schedule
from waveformer_tpu.training.state import TrainState, make_optimizer, make_train_step


def _logits_labels(rng, b=2, s=8, c=4):
    logits = jnp.asarray(rng.standard_normal((b, s, s, s, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, (b, s, s, s, 1)), jnp.int32)
    return logits, labels


class TestLossesVsMonai:
    """Cross-check vs the vendored MONAI in /root/reference (exact training
    loss of `3_train.py:72`)."""

    pytestmark = pytest.mark.skipif(
        not os.path.isdir("/root/reference"), reason="reference not mounted"
    )

    def _monai_dicece(self):
        import sys

        sys.path.insert(0, "/root/reference")
        from monai.losses import DiceCELoss as MonaiDiceCE

        return MonaiDiceCE(to_onehot_y=True, softmax=True)

    def test_dice_ce_matches_monai(self, rng):
        import torch

        loss_t = self._monai_dicece()
        logits, labels = _logits_labels(rng)
        got = float(dice_ce_loss(logits, labels))
        lt = torch.from_numpy(np.asarray(logits).transpose(0, 4, 1, 2, 3))
        yt = torch.from_numpy(
            np.asarray(labels).transpose(0, 4, 1, 2, 3).astype(np.int64)
        )
        want = float(loss_t(lt, yt))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_perfect_prediction_near_zero_dice(self, rng):
        _, labels = _logits_labels(rng)
        onehot = jax.nn.one_hot(labels[..., 0], 4) * 50.0
        d = float(soft_dice_loss(onehot, labels))
        assert d < 1e-3


class TestLossProperties:
    def test_ce_matches_manual(self, rng):
        logits, labels = _logits_labels(rng, b=1, s=4)
        got = float(softmax_cross_entropy(logits, labels))
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lab = np.asarray(labels)[..., 0]
        want = -np.mean(
            np.take_along_axis(lp, lab[..., None], axis=-1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_topk_upper_bounds_ce(self, rng):
        logits, labels = _logits_labels(rng)
        assert float(topk_cross_entropy(logits, labels, 10.0)) >= float(
            softmax_cross_entropy(logits, labels)
        )

    def test_deep_supervision_weights(self):
        w = np.asarray(deep_supervision_weights(4))
        assert w[-1] == 0.0
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
        assert w[0] > w[1] > w[2]

    def test_batch_dice_psum_equals_global(self, rng):
        """Sharded batch-dice must equal single-device batch-dice — the
        psum equivalent of nnUNet's AllGatherGrad global dice
        (`light_training/loss/ddp_allgather.py:25-48`)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        logits, labels = _logits_labels(rng, b=8)
        want = float(soft_dice_loss(logits, labels, batch_dice=True))

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

        @jax.jit
        def sharded(lg, lb):
            def inner(lg, lb):
                return soft_dice_loss(
                    lg, lb, batch_dice=True, axis_name="data"
                )

            return jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P(),
            )(lg, lb)

        got = float(sharded(logits, labels))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestSchedules:
    def test_poly(self):
        s = make_schedule("poly", 1e-2, total_steps=100)
        assert float(s(0)) == pytest.approx(1e-2)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-9)
        assert float(s(50)) == pytest.approx(1e-2 * 0.5**0.9, rel=1e-5)

    def test_warmup_cosine(self):
        s = make_schedule("warmup_cosine", 1e-3, total_steps=100, warmup_steps=10)
        assert float(s(0)) < float(s(10))
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(s(100)) < 1e-4

    def test_constant_default(self):
        s = make_schedule(None, 3e-4, total_steps=10)
        assert float(s(7)) == pytest.approx(3e-4)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_schedule("nope", 1e-3, 10)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_tiny_model(self, rng):
        from waveformer_tpu.models import Waveformer

        model = Waveformer(
            img_size=(16, 16, 16),
            patch_size=2,
            in_chans=1,
            out_chans=2,
            depths=(1, 1, 1, 1),
            embed_dims=(4, 8, 16, 32),
            num_heads=(1, 2, 4, 4),
            decom_levels=(3, 2, 1, 0),
            drop_path_rate=0.0,
        )
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 1)), jnp.float32)
        seg = jnp.asarray(
            (np.asarray(x)[..., :1] > 0).astype(np.int32)
        )
        params = model.init(jax.random.PRNGKey(0), x)
        state = TrainState.create(params, make_optimizer(lr=1e-3))
        step = make_train_step(model.apply, dice_ce_loss)
        batch = {"data": x, "seg": seg}
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    @pytest.mark.slow
    def test_use_checkpoint_matches_no_remat(self, rng):
        """use_checkpoint (remat of encoder blocks AND the full-res conv
        path) must not change forward logits or gradients — it only trades
        recompute for HBM."""
        from waveformer_tpu.models import Waveformer

        kwargs = dict(
            img_size=(16, 16, 16),
            patch_size=2,
            in_chans=1,
            out_chans=2,
            depths=(1, 1, 1, 1),
            embed_dims=(4, 8, 16, 32),
            num_heads=(1, 2, 4, 4),
            decom_levels=(3, 2, 1, 0),
            drop_path_rate=0.0,
        )
        base = Waveformer(**kwargs)
        remat = Waveformer(use_checkpoint=True, **kwargs)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)), jnp.float32)
        seg = jnp.asarray((np.asarray(x)[..., :1] > 0).astype(np.int32))
        params = base.init(jax.random.PRNGKey(0), x)
        # identical param trees: nn.remat must not change names/shapes
        params_r = remat.init(jax.random.PRNGKey(0), x)
        chex = jax.tree_util.tree_structure
        assert chex(params) == chex(params_r)

        def loss_of(model):
            def f(p):
                return dice_ce_loss(model.apply(p, x), seg)

            return jax.jit(jax.value_and_grad(f))

        l0, g0 = loss_of(base)(params)
        l1, g1 = loss_of(remat)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_multi_device_step_matches_single(self, rng):
        """DP-sharded step must produce the same updated params as an
        unsharded step on the full batch (the DDP-equivalence guarantee)."""
        from waveformer_tpu.models import Waveformer
        from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh, replicate, shard_batch

        model = Waveformer(
            img_size=(16, 16, 16),
            patch_size=2,
            in_chans=1,
            out_chans=2,
            depths=(1, 1, 1, 1),
            embed_dims=(4, 8, 16, 32),
            num_heads=(1, 2, 4, 4),
            decom_levels=(3, 2, 1, 0),
            drop_path_rate=0.0,
        )
        x = jnp.asarray(rng.standard_normal((4, 16, 16, 16, 1)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 2, (4, 16, 16, 16, 1)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)
        batch = {"data": x, "seg": seg}

        import optax

        # plain SGD so the comparison is on gradients, not Adam's
        # sign-amplified first step (fp reduction order across devices
        # perturbs grads at 1e-7, which Adam turns into lr-sized diffs)
        state1 = TrainState.create(params, optax.sgd(1e-2))
        step1 = make_train_step(model.apply, dice_ce_loss, donate=False)
        state1, m1 = step1(state1, batch, jax.random.PRNGKey(9))

        mesh = make_mesh(MeshSpec(data=4), jax.devices()[:4])
        state2 = replicate(mesh, TrainState.create(params, optax.sgd(1e-2)))
        step2 = make_train_step(model.apply, dice_ce_loss, mesh=mesh, donate=False)
        state2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(9))

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
        )
        l1 = jax.tree.leaves(state1.params)
        l2 = jax.tree.leaves(state2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestDiceBCE:
    """Region-based DC_and_BCE parity vs the reference torch formula
    (`light_training/loss/compound_losses.py:60-100`, `loss/dice.py:58-115`)."""

    def _torch_ref(self, logits, targets, use_ignore=False):
        import torch

        x = torch.from_numpy(logits)  # (B, C, *spatial)
        y = torch.from_numpy(targets)
        if use_ignore:
            mask = (1 - y[:, -1:])
            y = y[:, :-1]
        else:
            mask = None
        bce = torch.nn.BCEWithLogitsLoss(reduction="none")(x, y)
        if mask is not None:
            ce = (bce * mask).sum() / torch.clip(mask.sum(), min=1e-8)
        else:
            ce = bce.mean()
        probs = torch.sigmoid(x)
        axes = list(range(2, x.ndim))
        if mask is not None:
            inter = (probs * y * mask).sum(axes)
            sp = (probs * mask).sum(axes)
            sg = (y * mask).sum(axes)
        else:
            inter = (probs * y).sum(axes)
            sp = probs.sum(axes)
            sg = y.sum(axes)
        inter, sp, sg = inter.sum(0), sp.sum(0), sg.sum(0)  # batch dice
        dc = (2 * inter + 1e-5) / torch.clip(sg + sp + 1e-5, 1e-8)
        return float(ce - dc.mean())

    def test_matches_torch_formula(self, rng):
        from waveformer_tpu.training.losses import dice_bce_loss

        logits = rng.standard_normal((2, 8, 8, 8, 3)).astype(np.float32)
        targets = (rng.random((2, 8, 8, 8, 3)) > 0.6).astype(np.float32)
        want = self._torch_ref(
            logits.transpose(0, 4, 1, 2, 3), targets.transpose(0, 4, 1, 2, 3)
        )
        got = float(dice_bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(want - got) < 1e-5, (want, got)

    def test_ignore_label(self, rng):
        from waveformer_tpu.training.losses import dice_bce_loss

        logits = rng.standard_normal((2, 8, 8, 8, 2)).astype(np.float32)
        targets = (rng.random((2, 8, 8, 8, 3)) > 0.5).astype(np.float32)
        want = self._torch_ref(
            logits.transpose(0, 4, 1, 2, 3), targets.transpose(0, 4, 1, 2, 3),
            use_ignore=True,
        )
        got = float(dice_bce_loss(jnp.asarray(logits), jnp.asarray(targets),
                                  use_ignore_label=True))
        assert abs(want - got) < 1e-5, (want, got)
