"""Training engine — the framework's L4 layer.

Capability match for `light_training/trainer.py:25-516` (`class Trainer`),
redesigned for TPU:

  * ONE controller process drives the whole `jax.sharding.Mesh` — the
    torchrun re-exec + NCCL bootstrap (`trainer.py:78-109`,
    `launch.py:69-117`) is replaced by `jax.distributed.initialize()` for
    multi-host and sharding annotations for everything else.
  * The train step (fwd/bwd/clip/AdamW) is one jitted XLA program; gradient
    sync is compiler-inserted collectives (≡ DDP all-reduce).
  * Epoch structure mirrors the reference: `num_steps_per_epoch` total steps
    (250 global — the reference's `250 // num_gpus` per rank), `val_every`
    epochs, fixed `val_patches_per_epoch` validation patches, rank-0-style
    TB/file logging, best/final/periodic checkpoints (`3_train.py:150-188`).
  * Improvement over the reference: auto-resume from the latest periodic
    state (the reference always restarts at epoch 0, `trainer.py:407`).

Subclasses override `training_loss` / `validation_step` / `validation_end`
like the reference's hooks (`trainer.py:483-493`).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.data.pipeline import PrefetchLoader
from waveformer_tpu.parallel.mesh import (
    default_mesh_for_batch,
    replicate,
    shard_batch,
)
from waveformer_tpu.training.checkpoint import CheckpointManager
from waveformer_tpu.training.losses import dice_ce_loss
from waveformer_tpu.training.schedules import make_schedule
from waveformer_tpu.training.state import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from waveformer_tpu.utils.logger import SummaryWriter, get_logger


class Trainer:
    """Patch-based segmentation trainer."""

    def __init__(
        self,
        model,
        max_epochs: int = 1000,
        batch_size: int = 4,
        val_every: int = 2,
        num_steps_per_epoch: int = 250,
        val_patches_per_epoch: int = 100,
        patch_size: Sequence[int] = (128, 128, 128),
        lr: float = 1e-4,
        weight_decay: float = 1e-2,
        grad_clip_norm: float = 12.0,
        scheduler: Optional[str] = None,
        warmup_epochs: float = 0.0,
        logdir: str = "./logs",
        model_name: str = "waveformer",
        mesh=None,
        num_workers: int = 12,
        cache_size: int = 6,
        # "train_fast" = the full nnUNet stack with the native OpenMP
        # order-1 spatial resample (vs scipy order-3). Default because the
        # augment pipeline is host-CPU-bound at flagship patch sizes:
        # 666 vs ~2000 ms/step on a 1-core host (BENCH_NOTES.md); pass
        # "train" for the reference's exact order-3 spline.
        augmentation: str = "train_fast",
        label_mode: str = "brats",
        num_classes: int = 4,
        seed: int = 42,
        resume: bool = True,
        # Full-volume validation: every `full_val_every` epochs, run the
        # real sliding-window predictor on `full_val_cases` whole validation
        # volumes and log stitch-level dice. Patch-level dice
        # (`validation_step`) cannot see stitching/blending regressions;
        # the reference has no equivalent (its `validation_step` is
        # patch-only, `3_train.py:132-148`). 0 disables (default — each
        # distinct case shape compiles its own sliding-window program).
        full_val_every: int = 0,
        full_val_cases: int = 2,
    ):
        self.model = model
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.val_every = val_every
        self.num_steps_per_epoch = num_steps_per_epoch
        self.val_patches_per_epoch = val_patches_per_epoch
        self.patch_size = tuple(patch_size)
        self.logdir = logdir
        self.model_name = model_name
        self.mesh = (
            mesh if mesh is not None else default_mesh_for_batch(batch_size)
        )
        self.num_workers = num_workers
        self.cache_size = cache_size
        self.augmentation = augmentation
        self.label_mode = label_mode
        self.num_classes = num_classes
        self.seed = seed
        self.resume = resume
        self.log = get_logger()

        total_steps = max_epochs * num_steps_per_epoch
        warmup_steps = int(warmup_epochs * num_steps_per_epoch)
        self.schedule = make_schedule(scheduler, lr, total_steps, warmup_steps)
        self.tx = make_optimizer(
            lr=self.schedule,
            weight_decay=weight_decay,
            grad_clip_norm=grad_clip_norm,
        )

        self.global_step = 0
        self.epoch = 0
        self.best_mean_dice = 0.0
        self.writer: Optional[SummaryWriter] = None
        self.ckpt = CheckpointManager(os.path.join(logdir, "model"))
        self._train_step = None
        self._eval_step = None
        self.full_val_every = full_val_every
        self.full_val_cases = full_val_cases
        self._full_val_inferer = None

    # ------------------------------------------------------------------ #
    # hooks (reference `trainer.py:483-493`)
    # ------------------------------------------------------------------ #
    def training_loss(self, logits, batch) -> jax.Array:
        return dice_ce_loss(logits, batch["seg"])

    def convert_labels(self, labels: jax.Array) -> jax.Array:
        """Label map (B,...,1) → (B, K, ...) binary stack for validation
        dice. `label_mode='brats'`: TC/WT/ET regions (`3_train.py:104-112`);
        `'multiclass'`: one binary channel per foreground class."""
        lab = labels[..., 0]
        if self.label_mode == "brats":
            tc = (lab == 1) | (lab == 3)
            wt = tc | (lab == 2)
            et = lab == 3
            return jnp.stack([tc, wt, et], axis=1).astype(jnp.float32)
        return jnp.stack(
            [lab == c for c in range(1, self.num_classes)], axis=1
        ).astype(jnp.float32)

    def validation_step(self, params, batch) -> np.ndarray:
        """Per-patch per-class dice (`3_train.py:132-148`), NaN where the
        class is absent from both prediction and ground truth — the
        reference's convention, so absent classes can be FILTERED from the
        epoch mean rather than counted as 1.0
        (`light_training/trainer.py:240-269`)."""
        logits = self._eval_step(params, batch["data"])
        pred = jnp.argmax(logits, axis=-1)[..., None]
        pred_c = self.convert_labels(pred)
        gt_c = self.convert_labels(batch["seg"].astype(jnp.int32))
        axes = tuple(range(2, pred_c.ndim))
        inter = jnp.sum(pred_c * gt_c, axis=axes)
        ps = jnp.sum(pred_c, axis=axes)
        gs = jnp.sum(gt_c, axis=axes)
        both_empty = (ps == 0) & (gs == 0)
        dice = jnp.where(both_empty, jnp.nan, 2 * inter / (ps + gs + 1e-8))
        return np.asarray(dice)  # (B, K), NaN = class absent everywhere

    def validation_end(self, mean_dice_per_class: np.ndarray):
        """Best/final/periodic checkpoint logic (`3_train.py:150-188`)."""
        if self.label_mode == "brats":
            names = ["tc", "wt", "et"][: len(mean_dice_per_class)]
        else:
            names = [f"class{c}" for c in range(1, len(mean_dice_per_class) + 1)]
        mean_dice = float(np.mean(mean_dice_per_class))
        for n, v in zip(names, mean_dice_per_class):
            self.log_scalar(f"{n}_dice", float(v), self.epoch)
        self.log_scalar("mean_dice", mean_dice, self.epoch)
        params = jax.device_get(self.state.params)
        if mean_dice > self.best_mean_dice:
            self.best_mean_dice = mean_dice
            self.ckpt.save_best(params, mean_dice, self.epoch, self.model_name)
            self.log.info(
                f"epoch {self.epoch}: new best mean dice {mean_dice:.4f}"
            )
        self.ckpt.save_final(params, mean_dice, self.epoch, self.model_name)
        if (self.epoch + 1) % 100 == 0:
            self.ckpt.save_state(
                self.state, self.epoch, extra={"mean_dice": mean_dice}
            )

    # ------------------------------------------------------------------ #
    def log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def _init_state(self, example_batch) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        params = jax.jit(self.model.init)(
            rng, jnp.zeros_like(jnp.asarray(example_batch["data"]))
        )
        state = TrainState.create(params, self.tx)
        return replicate(self.mesh, state)

    # ------------------------------------------------------------------ #
    def train(self, train_ds, val_ds) -> float:
        """Run the full loop; returns best mean dice."""
        self.writer = SummaryWriter(self.logdir)
        train_loader = PrefetchLoader(
            train_ds,
            steps_per_epoch=self.num_steps_per_epoch,
            patch_size=self.patch_size,
            batch_size=self.batch_size,
            transform=self.augmentation,
            num_workers=self.num_workers,
            cache_size=self.cache_size,
            seed=self.seed,
        )
        n_val_batches = max(1, self.val_patches_per_epoch // self.batch_size)
        val_loader = PrefetchLoader(
            val_ds,
            steps_per_epoch=n_val_batches,
            patch_size=self.patch_size,
            batch_size=self.batch_size,
            transform="val",
            num_workers=0,
            seed=self.seed + 1,
        )

        first = next(iter(
            PrefetchLoader(
                train_ds, steps_per_epoch=1, patch_size=self.patch_size,
                batch_size=self.batch_size, transform="noaug",
                num_workers=0, seed=self.seed,
            )
        ))
        self.state = self._init_state(first)
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )
        self.log.info(
            f"model {self.model_name}: {n_params:,} params; "
            f"mesh {dict(self.mesh.shape)}"
        )

        start_epoch = 0
        if self.resume and self.ckpt.latest_checkpoint() is not None:
            path, epoch = self.ckpt.latest_checkpoint()
            self.state = self.ckpt.load_state(self.state, path)
            start_epoch = epoch + 1
            self.global_step = int(self.state.step)
            self.log.info(f"resumed from {path} at epoch {start_epoch}")

        self._train_step = make_train_step(
            self.model.apply,
            lambda logits, seg: self.training_loss(logits, {"seg": seg}),
            mesh=self.mesh,
        )
        self._eval_step = make_eval_step(self.model.apply, mesh=self.mesh)

        try:
            for self.epoch in range(start_epoch, self.max_epochs):
                t0 = time.time()
                epoch_loss = self._train_epoch(train_loader)
                self.log_scalar("epoch_loss", epoch_loss, self.epoch)
                self.log_scalar(
                    "lr", float(self.schedule(self.global_step)), self.epoch
                )
                self.log.info(
                    f"epoch {self.epoch}: loss {epoch_loss:.4f} "
                    f"({time.time() - t0:.1f}s)"
                )
                if (self.epoch + 1) % self.val_every == 0:
                    dices = self._validate(val_loader)
                    self.validation_end(dices)
                if (
                    self.full_val_every
                    and (self.epoch + 1) % self.full_val_every == 0
                ):
                    self.full_volume_validation(val_ds)
        finally:
            train_loader.shutdown()
            if self.writer is not None:
                self.writer.close()
        return self.best_mean_dice

    # ------------------------------------------------------------------ #
    def _device_batch(self, batch) -> Dict[str, jax.Array]:
        out = {
            "data": np.asarray(batch["data"], np.float32),
            "seg": np.asarray(batch["seg"], np.int32),
        }
        return shard_batch(self.mesh, out)

    # How many steps the host may run ahead of the device before blocking
    # on a loss readback. float(loss) every step costs one ~40 ms
    # host↔device round trip AND serializes augmentation against device
    # compute; a small window keeps host/device overlapped while bounding
    # in-flight device batches (each enqueued batch holds HBM).
    loss_readback_window: int = 4

    def _train_epoch(self, loader) -> float:
        losses = []
        pending: List = []  # [(global_step, device loss array)]

        def drain(limit: int):
            while len(pending) > limit:
                s, dev = pending.pop(0)
                loss = float(dev)
                losses.append(loss)
                self.log_scalar("training_loss", loss, s)

        for batch in loader:
            b = self._device_batch(batch)
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), self.global_step
            )
            self.state, metrics = self._train_step(self.state, b, rng)
            pending.append((self.global_step, metrics["loss"]))
            self.global_step += 1
            drain(self.loss_readback_window)
        drain(0)
        return float(np.mean(losses)) if losses else 0.0

    def _validate(self, loader) -> np.ndarray:
        per_patch: List[np.ndarray] = []
        for batch in loader:
            b = self._device_batch(batch)
            per_patch.append(self.validation_step(self.state.params, b))
        all_vals = np.concatenate(per_patch, axis=0)  # (N, K) with NaNs
        # reference semantics: mean over non-NaN patches per class; a class
        # absent from every patch scores 0 (`light_training/trainer.py:240-269`)
        counts = np.sum(~np.isnan(all_vals), axis=0)
        sums = np.nansum(all_vals, axis=0)
        return np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)

    # ------------------------------------------------------------------ #
    def full_volume_validation(
        self, val_ds, max_cases: Optional[int] = None
    ) -> Optional[np.ndarray]:
        """Stitch-level validation: sliding-window inference on whole
        preprocessed validation volumes with the CURRENT parameters,
        per-class full-volume dice logged as `full_{tc,wt,et}_dice`.

        Catches regressions the patch dice cannot (window stitching,
        Gaussian blending, bucket padding). No TTA (cost control); current
        params are threaded through the jit boundary via `predictor_args`,
        never closed over (a closure would freeze them into the compiled
        program). Returns per-class dice means, or None if no cases ran."""
        from waveformer_tpu.inference.sliding_window import (
            SlidingWindowInferer,
        )

        n = min(len(val_ds), max_cases or self.full_val_cases)
        if n <= 0:
            return None
        if self._full_val_inferer is None:
            self._full_val_inferer = SlidingWindowInferer(
                roi_size=self.patch_size,
                sw_batch_size=2,
                overlap=0.5,
                mirror_axes=None,
                layout="channels_last",
            )
            self._full_val_apply = lambda patches, params: self.model.apply(
                params, patches
            )
        dev0 = jax.devices()[0]
        params = jax.tree.map(
            lambda x: jax.device_put(x, dev0), self.state.params
        )
        per_case: List[np.ndarray] = []
        t0 = time.time()
        for i in range(n):
            item = val_ds[i]
            data = np.asarray(item["data"], np.float32)  # (C, D, H, W)
            seg_gt = np.asarray(item["seg"])  # (1, D, H, W)
            vol = data.transpose(1, 2, 3, 0)  # channels-last
            logits = self._full_val_inferer(
                vol,
                self._full_val_apply,
                self.num_classes,
                predictor_args=(params,),
            )
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            per_case.append(self._case_dice(pred, seg_gt[0]))
        vals = np.stack(per_case)  # (n, K) with NaNs for absent classes
        counts = np.sum(~np.isnan(vals), axis=0)
        sums = np.nansum(vals, axis=0)
        per_class = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        if self.label_mode == "brats":
            names = ["tc", "wt", "et"][: len(per_class)]
        else:
            names = [f"class{c}" for c in range(1, len(per_class) + 1)]
        for name, v in zip(names, per_class):
            self.log_scalar(f"full_{name}_dice", float(v), self.epoch)
        self.log.info(
            f"epoch {self.epoch}: full-volume dice "
            + " ".join(f"{k}={v:.4f}" for k, v in zip(names, per_class))
            + f" ({n} cases, {time.time() - t0:.1f}s)"
        )
        return per_class

    def _case_dice(self, pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
        """Per-class dice of one full volume, NaN where a class is absent
        from both (the reference's filtering convention)."""
        pred_c = np.asarray(
            self.convert_labels(jnp.asarray(pred)[None, ..., None])
        )[0]
        gt_c = np.asarray(
            self.convert_labels(jnp.asarray(gt, jnp.int32)[None, ..., None])
        )[0]
        axes = tuple(range(1, pred_c.ndim))
        inter = np.sum(pred_c * gt_c, axis=axes)
        ps = np.sum(pred_c, axis=axes)
        gs = np.sum(gt_c, axis=axes)
        both_empty = (ps == 0) & (gs == 0)
        return np.where(both_empty, np.nan, 2 * inter / (ps + gs + 1e-8))

    # ------------------------------------------------------------------ #
    def validation_single_gpu(
        self, test_ds, predict_case: Optional[Callable] = None
    ) -> Tuple[Any, np.ndarray]:
        """Single-process full-case validation with the reference's
        aggregation contract (`trainer.py:216-269`): run the per-case
        validation step over the whole dataset, then NaN-aware-average the
        outputs — per component when the step returns a vector (per-class
        dice), scalar otherwise; a component that is NaN for every case
        averages to 0. Returns ``(mean_or_means, all_outputs)``.

        ``predict_case(item) -> float | sequence`` is the model-define
        hook; omitted, it defaults to sliding-window inference + per-class
        dice against the stored segmentation (the reference's
        ``define_model_waveformer`` + ``validation_step`` pairing).
        """
        if jax.process_count() > 1:
            raise RuntimeError(
                "validation_single_gpu is single-process by contract "
                "(reference refuses under DDP, trainer.py:217-219); use "
                "sharded inference instead"
            )
        if predict_case is None:
            from waveformer_tpu.inference.sliding_window import (
                SlidingWindowInferer,
            )

            inferer = SlidingWindowInferer(
                roi_size=self.patch_size, sw_batch_size=2, overlap=0.5,
                mirror_axes=None, layout="channels_last",
            )
            apply = lambda patches, params: self.model.apply(params, patches)
            if not hasattr(self, "state"):
                # standalone use before train(): initialize fresh params
                # (the reference's define-model hook loads its checkpoint
                # here; use load_params() for that)
                item0 = test_ds[0]
                example = {
                    "data": np.asarray(
                        item0["data"], np.float32
                    ).transpose(1, 2, 3, 0)[None][:, : self.patch_size[0],
                                                  : self.patch_size[1],
                                                  : self.patch_size[2]],
                }
                self.state = self._init_state(example)
            params = self.state.params

            def predict_case(item):  # default hook: stitch + per-class dice
                vol = np.asarray(item["data"], np.float32).transpose(1, 2, 3, 0)
                logits = inferer(
                    vol, apply, self.num_classes, predictor_args=(params,)
                )
                pred = np.asarray(jnp.argmax(logits, axis=-1))
                return self._case_dice(pred, np.asarray(item["seg"])[0])

        outputs = []
        for i in range(len(test_ds)):
            out = predict_case(test_ds[i])
            outputs.append(np.asarray(out, np.float64))
            self.log.info(
                f"validation case {i + 1}/{len(test_ds)}: {outputs[-1]}"
            )
        all_outputs = np.stack(outputs)
        # NaN-aware per-component mean; all-NaN component → 0
        counts = np.sum(~np.isnan(all_outputs), axis=0)
        sums = np.nansum(all_outputs, axis=0)
        means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        if all_outputs.ndim == 1:
            return float(means), all_outputs
        return means, all_outputs

    def load_params(self, path: str):
        from waveformer_tpu.training.checkpoint import load_params_npz

        params = load_params_npz(path)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, params)
        )
