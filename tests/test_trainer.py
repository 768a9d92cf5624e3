"""Trainer engine tests: end-to-end loop, checkpoints, resume, logging."""

import glob
import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.models import Waveformer
from waveformer_tpu.training.checkpoint import (
    CheckpointManager,
    load_params_npz,
    save_new_model_and_delete_last,
    save_params_npz,
)
from waveformer_tpu.training.trainer import Trainer
from waveformer_tpu.utils.logger import SummaryWriter, crc32c, setup_logging


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Synthetic preprocessed cases written directly as npz/pkl."""
    import pickle

    out = tmp_path_factory.mktemp("fullres")
    rng = np.random.default_rng(0)
    for i in range(3):
        shape = (40, 40, 40)
        data = rng.standard_normal((1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.int8)
        seg[0, 10:25, 10:25, 10:25] = 1
        seg[0, 15:20, 15:20, 15:20] = 3
        data[0][seg[0] > 0] += 2.0  # learnable signal
        np.savez_compressed(out / f"case_{i}.npz", data=data, seg=seg)
        locs = np.argwhere(seg == 1)
        locs3 = np.argwhere(seg == 3)
        props = {
            "spacing": [1, 1, 1],
            "class_locations": {1: locs[:500], 3: locs3[:500]},
            "shape_before_cropping": shape,
            "bbox_used_for_cropping": [[0, 40], [0, 40], [0, 40]],
            "shape_after_cropping_before_resample": shape,
        }
        with open(out / f"case_{i}.pkl", "wb") as f:
            pickle.dump(props, f)
    return str(out)


def _tiny_model():
    return Waveformer(
        img_size=(16, 16, 16), patch_size=2, in_chans=1, out_chans=4,
        depths=(1, 1, 1, 1), embed_dims=(4, 8, 16, 32),
        num_heads=(1, 2, 4, 4), decom_levels=(3, 2, 1, 0),
        drop_path_rate=0.0,
    )


class TestTrainerLoop:
    @pytest.mark.slow
    def test_two_epochs_with_validation(self, tiny_dataset, tmp_path):
        from waveformer_tpu.data.dataset import MedicalDataset

        ds = MedicalDataset(tiny_dataset, [f"case_{i}" for i in range(3)])
        logdir = str(tmp_path / "logs")
        trainer = Trainer(
            _tiny_model(),
            max_epochs=2,
            batch_size=2,
            val_every=1,
            num_steps_per_epoch=3,
            val_patches_per_epoch=2,
            patch_size=(16, 16, 16),
            lr=1e-3,
            logdir=logdir,
            num_workers=0,
            seed=0,
        )
        best = trainer.train(ds, ds)
        assert 0.0 <= best <= 1.0
        # best + final checkpoints exist
        assert glob.glob(os.path.join(logdir, "model", "best_model_*.npz"))
        assert glob.glob(os.path.join(logdir, "model", "final_model_*.npz"))
        # metrics jsonl mirrors scalars
        with open(os.path.join(logdir, "metrics.jsonl")) as f:
            tags = {json.loads(l)["tag"] for l in f}
        assert {"training_loss", "epoch_loss", "mean_dice", "lr"} <= tags

    @pytest.mark.slow
    def test_resume_from_periodic(self, tiny_dataset, tmp_path):
        from waveformer_tpu.data.dataset import MedicalDataset

        ds = MedicalDataset(tiny_dataset, ["case_0", "case_1"], unpack=False)
        logdir = str(tmp_path / "logs2")

        def mk(max_epochs):
            t = Trainer(
                _tiny_model(), max_epochs=max_epochs, batch_size=2,
                val_every=100, num_steps_per_epoch=2,
                patch_size=(16, 16, 16), logdir=logdir, num_workers=0,
                seed=0,
            )
            return t

        t1 = mk(1)
        t1.train(ds, ds)
        t1.ckpt.save_state(t1.state, 0)  # periodic state at epoch 0
        step_after = int(t1.state.step)

        t2 = mk(2)
        t2.train(ds, ds)
        # resumed: started at epoch 1, so total steps = step_after + 2
        assert int(t2.state.step) == step_after + 2


class TestFullVolumeValidation:
    """Stitch-level validation hook (beyond the reference — its validation
    is patch-only, `3_train.py:132-148`)."""

    @pytest.mark.slow
    def test_hook_runs_and_logs(self, tiny_dataset, tmp_path):
        from waveformer_tpu.data.dataset import MedicalDataset

        ds = MedicalDataset(
            tiny_dataset, [f"case_{i}" for i in range(3)], unpack=False
        )
        logdir = str(tmp_path / "logs_fv")
        trainer = Trainer(
            _tiny_model(),
            max_epochs=1,
            batch_size=2,
            val_every=1,
            num_steps_per_epoch=2,
            val_patches_per_epoch=2,
            patch_size=(16, 16, 16),
            logdir=logdir,
            num_workers=0,
            seed=0,
            full_val_every=1,
            full_val_cases=2,
        )
        trainer.train(ds, ds)
        with open(os.path.join(logdir, "metrics.jsonl")) as f:
            tags = {json.loads(l)["tag"] for l in f}
        assert {"full_tc_dice", "full_wt_dice", "full_et_dice"} <= tags

    def test_full_volume_dice_is_exact_on_perfect_model(self, tmp_path):
        """With a predictor that returns the GT as logits, full-volume dice
        must be exactly 1 for present classes — proving the stitch +
        argmax + conversion path."""
        import pickle

        from waveformer_tpu.data.dataset import MedicalDataset

        out = tmp_path / "fullres"
        out.mkdir()
        rng = np.random.default_rng(1)
        shape = (24, 20, 28)  # non-bucket-aligned on purpose
        seg = np.zeros((1, *shape), np.int8)
        seg[0, 4:12, 5:13, 6:14] = 1
        seg[0, 7:10, 7:10, 8:11] = 3
        data = rng.standard_normal((1, *shape)).astype(np.float32)
        np.savez_compressed(out / "case_0.npz", data=data, seg=seg)
        with open(out / "case_0.pkl", "wb") as f:
            pickle.dump({"spacing": [1, 1, 1]}, f)
        ds = MedicalDataset(str(out), ["case_0"], unpack=False)

        t = Trainer(
            _tiny_model(), patch_size=(16, 16, 16), logdir=str(tmp_path),
            num_workers=0, full_val_cases=1,
        )
        # perfect prediction → dice exactly 1 for present classes
        d = t._case_dice(np.asarray(seg[0]), np.asarray(seg[0]))
        np.testing.assert_allclose(d, [1.0, 1.0, 1.0], atol=1e-6)

        # and the end-to-end hook with a trivially-constant model: a
        # predictor that always emits class 0 gives dice 0 for present
        # classes (never NaN) — exercising stitch + argmax on a
        # non-aligned shape
        class ZeroModel:
            out_chans = 4

            def apply(self, params, patches):
                B = patches.shape[0]
                logits = jnp.zeros((*patches.shape[:-1], 4))
                return logits.at[..., 0].set(1.0)

        t.model = ZeroModel()
        t.state = type("S", (), {"params": {}})()
        t.writer = None
        per_class = t.full_volume_validation(ds)
        np.testing.assert_allclose(per_class, [0.0, 0.0, 0.0], atol=1e-6)


class TestCheckpointHelpers:
    def test_save_delete_last(self, tmp_path, rng):
        params = {"params": {"w": rng.standard_normal((3, 3)).astype(np.float32)}}
        d = str(tmp_path)
        save_new_model_and_delete_last(
            params, os.path.join(d, "best_model_0.5.npz"), "best_model"
        )
        save_new_model_and_delete_last(
            params, os.path.join(d, "best_model_0.7.npz"), "best_model"
        )
        hits = glob.glob(os.path.join(d, "best_model_*.npz"))
        assert len(hits) == 1 and "0.7" in hits[0]

    def test_params_npz_roundtrip(self, tmp_path, rng):
        params = {
            "params": {
                "layer": {"kernel": rng.standard_normal((4, 2)).astype(np.float32)},
                "bias": np.zeros(2, np.float32),
            }
        }
        p = str(tmp_path / "m.npz")
        save_params_npz(params, p, metadata={"epoch": 3})
        back = load_params_npz(p)
        np.testing.assert_array_equal(
            back["params"]["layer"]["kernel"], params["params"]["layer"]["kernel"]
        )
        assert json.load(open(p + ".json"))["epoch"] == 3

    def test_manager_periodic_prune_and_latest(self, tmp_path):
        import optax

        from waveformer_tpu.training.state import TrainState

        state = TrainState.create(
            {"params": {"w": jnp.zeros((2, 2))}}, optax.sgd(1e-2)
        )
        cm = CheckpointManager(str(tmp_path / "ck"), keep_periodic=2)
        for e in (99, 199, 299):
            cm.save_state(state, e)
        ckpts = glob.glob(str(tmp_path / "ck" / "state_epoch_*"))
        ckpts = [c for c in ckpts if not c.endswith(".json")]
        assert len(ckpts) == 2
        path, epoch = cm.latest_checkpoint()
        assert epoch == 299
        restored = cm.load_state(state, path)
        assert int(restored.step) == 0


class TestSummaryWriter:
    def test_tfevents_record_framing(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("loss", 0.5, 1)
        w.close()
        events = glob.glob(str(tmp_path / "events.out.tfevents.*"))
        assert events
        raw = open(events[0], "rb").read()
        # first record: header(8) + crc(4) + payload + crc(4); verify framing
        ln = struct.unpack("<Q", raw[:8])[0]
        assert 0 < ln < 200
        payload = raw[12 : 12 + ln]
        assert b"brain.Event:2" in payload
        # second record should contain our tag
        off = 12 + ln + 4
        ln2 = struct.unpack("<Q", raw[off : off + 8])[0]
        payload2 = raw[off + 12 : off + 12 + ln2]
        assert b"loss" in payload2

    def test_crc32c_known_vector(self):
        # RFC 3720 test vector: 32 bytes of zeros → 0x8a9136aa
        assert crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_logger_levels(self, tmp_path, capsys):
        log_file = str(tmp_path / "t.log")
        lg = setup_logging(log_file=log_file, file_level="debug",
                           console_level="error")
        lg.debug("to-file-only")
        lg.error("to-both")
        out = capsys.readouterr().out
        assert "to-both" in out and "to-file-only" not in out
        content = open(log_file).read()
        assert "to-file-only" in content


class TestLabelModes:
    def test_multiclass_conversion(self):
        import jax.numpy as jnp

        t = Trainer(_tiny_model(), label_mode="multiclass", num_classes=4,
                    num_workers=0)
        lab = jnp.asarray([[[[[0], [1]], [[2], [3]]]]], jnp.int32)
        out = np.asarray(t.convert_labels(lab))
        assert out.shape[1] == 3  # classes 1..3
        assert out[0, 0].sum() == 1 and out[0, 2].sum() == 1

    def test_brats_conversion_default(self):
        import jax.numpy as jnp

        t = Trainer(_tiny_model(), num_workers=0)
        lab = jnp.asarray([[[[[3]]]]], jnp.int32)
        out = np.asarray(t.convert_labels(lab))
        np.testing.assert_array_equal(out[0, :, 0, 0, 0], [1, 1, 1])


class TestValidationDiceSemantics:
    """NaN-filtered validation mean (reference `trainer.py:240-269`):
    absent classes are excluded from the per-class mean, not scored 1.0."""

    def test_nan_filtering(self, tiny_dataset, tmp_path):
        t = Trainer(_tiny_model(), max_epochs=1, batch_size=1,
                    patch_size=(16, 16, 16), logdir=str(tmp_path),
                    label_mode="multiclass", num_classes=4)

        class FakeLoader:
            def __init__(self, arrays):
                self.arrays = arrays
            def __iter__(self):
                return iter([])

        # simulate 3 patches x 3 classes: class0 present everywhere,
        # class1 absent (NaN) in patch 1, class2 absent everywhere
        vals = [
            np.array([[0.8, np.nan, np.nan]]),
            np.array([[0.6, 0.4, np.nan]]),
            np.array([[0.7, 0.2, np.nan]]),
        ]
        t.validation_step = lambda p, b: vals.pop(0)
        t._device_batch = lambda b: b
        t.state = type("S", (), {"params": None})()

        class L:
            def __iter__(self):
                return iter([1, 2, 3])

        out = t._validate(L())
        np.testing.assert_allclose(out[0], 0.7, atol=1e-6)
        np.testing.assert_allclose(out[1], 0.3, atol=1e-6)  # mean of 0.4, 0.2
        assert out[2] == 0.0  # all-NaN class scores 0, not 1

    def test_validation_step_emits_nan_for_absent_class(self, rng, tmp_path):
        t = Trainer(_tiny_model(), max_epochs=1, batch_size=1,
                    patch_size=(16, 16, 16), logdir=str(tmp_path),
                    label_mode="multiclass", num_classes=4)
        import jax
        params = t.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1))
        )
        from waveformer_tpu.training.state import make_eval_step
        t._eval_step = make_eval_step(t.model.apply, mesh=t.mesh)
        seg = np.zeros((1, 16, 16, 16, 1), np.int8)
        seg[0, 2:6, 2:6, 2:6] = 1  # only class 1 present
        batch = {"data": jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)),
                                     jnp.float32),
                 "seg": jnp.asarray(seg)}
        d = t.validation_step(params, batch)
        assert d.shape == (1, 3)
        # classes 2 and 3 are absent from GT; NaN only if also absent from
        # prediction — class 1 present in GT must be a number
        assert not np.isnan(d[0, 0])


class TestValidationSingleGpu:
    """Reference aggregation contract (`trainer.py:216-269`): NaN-aware
    per-component means over per-case validation outputs, all-NaN
    component -> 0, (means, all_outputs) return shape."""

    def _trainer(self, tmp_path):
        return Trainer(
            _tiny_model(), max_epochs=1, batch_size=1,
            patch_size=(16, 16, 16), logdir=str(tmp_path / "logs"),
            num_workers=0, resume=False,
        )

    def test_vector_outputs_nan_aware_mean(self, tiny_dataset, tmp_path):
        t = self._trainer(tmp_path)
        outs = iter([
            np.array([0.8, np.nan, 0.6]),
            np.array([0.6, np.nan, np.nan]),
            np.array([np.nan, np.nan, 0.2]),
        ])

        class FakeDS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"i": i}

        means, all_outputs = t.validation_single_gpu(
            FakeDS(), predict_case=lambda item: next(outs)
        )
        np.testing.assert_allclose(means, [0.7, 0.0, 0.4])
        assert all_outputs.shape == (3, 3)

    def test_scalar_outputs(self, tiny_dataset, tmp_path):
        t = self._trainer(tmp_path)
        vals = iter([0.5, np.nan, 0.9])

        class FakeDS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"i": i}

        mean, all_outputs = t.validation_single_gpu(
            FakeDS(), predict_case=lambda item: next(vals)
        )
        assert mean == pytest.approx(0.7)
        assert all_outputs.shape == (3,)

    def test_default_hook_runs_inference(self, tiny_dataset, tmp_path):
        from waveformer_tpu.data.dataset import MedicalDataset

        t = self._trainer(tmp_path)
        ds = MedicalDataset(tiny_dataset, ["case_0"])
        means, all_outputs = t.validation_single_gpu(ds)
        assert all_outputs.shape == (1, t.num_classes - 1)
        means = np.asarray(means)
        assert np.isfinite(means).all()
