"""Sustained training throughput on the real chip (VERDICT r3 #5).

Runs the REAL `Trainer.train` loop — PrefetchLoader workers, augmentation,
upload, jitted fwd+bwd+AdamW — on synthetic preprocessed BraTS-sized cases
at flagship settings (128³ patch, 4 channels, batch 1/chip like the
reference's global-4-over-4-GPUs), and reports warm-epoch steps/s next to
the device-only step rate, so host-vs-device occupancy is a measurement,
not an inference from 1-core augment microbenches.

    python tools/bench_train.py --steps 60 --epochs 3 --aug train_fast
    python tools/bench_train.py --device-only        # device upper bound

Reference protocol anchor: config.yaml:10-13 (batch 4 global, 128³),
light_training/trainer.py:451-471 (250-step epochs).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import tempfile
import time


def make_cases(root: str, n: int = 4, shape=(150, 180, 145)) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    for i in range(n):
        data = rng.standard_normal((4, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.int8)
        seg[0, 40:90, 50:100, 40:80] = 1
        seg[0, 55:70, 60:80, 50:65] = 3
        seg[0, 45:60, 80:95, 60:75] = 2
        np.savez(os.path.join(root, f"case_{i}.npz"), data=data, seg=seg)
        props = {
            "spacing": [1.0, 1.0, 1.0],
            "class_locations": {
                c: np.argwhere(seg == c)[:2000] for c in (1, 2, 3)
            },
            "shape_before_cropping": shape,
            "bbox_used_for_cropping": [[0, s] for s in shape],
            "shape_after_cropping_before_resample": shape,
        }
        with open(os.path.join(root, f"case_{i}.pkl"), "wb") as f:
            pickle.dump(props, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--workers", type=int, default=12)
    ap.add_argument("--aug", default="train_fast", choices=["train", "train_fast"])
    ap.add_argument("--device-only", action="store_true",
                    help="chained jitted steps on one resident batch (no pipeline)")
    ap.add_argument("--window", type=int, default=4,
                    help="Trainer.loss_readback_window (0 = sync float(loss) every step)")
    ap.add_argument("--remat", action="store_true",
                    help="use_checkpoint=True (block + full-res conv remat)")
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from waveformer_tpu.config import Config
    from waveformer_tpu.models import create_waveformer
    from waveformer_tpu.training.trainer import Trainer

    cfg = Config()
    kw = cfg.network.model_kwargs()
    if args.remat:
        kw["use_checkpoint"] = True
    model = create_waveformer(kw, dtype=jnp.bfloat16)

    if args.device_only:
        from waveformer_tpu.parallel.mesh import default_mesh_for_batch, replicate, shard_batch
        from waveformer_tpu.training.losses import dice_ce_loss
        from waveformer_tpu.training.state import TrainState, make_optimizer, make_train_step

        mesh = default_mesh_for_batch(args.batch)
        rng = np.random.default_rng(0)
        batch = {
            "data": rng.standard_normal((args.batch, 128, 128, 128, 4)).astype(np.float32),
            "seg": np.zeros((args.batch, 128, 128, 128, 1), np.int32),
        }
        b = shard_batch(mesh, batch)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(b["data"][:1])))
        tx = make_optimizer(lr=1e-4, weight_decay=1e-2, grad_clip_norm=12.0)
        state = replicate(mesh, TrainState.create(params, tx))
        step = make_train_step(model.apply, lambda lg, seg: dice_ce_loss(lg, seg), mesh=mesh)
        key = jax.random.PRNGKey(0)
        state, m = step(state, b, key)  # compile
        # NOTE: jax.block_until_ready does NOT actually wait on this
        # environment's tunneled backend (measured: a 100 ms forward
        # "blocks" in 0.2 ms) — only a value readback is an honest sync.
        float(m["loss"])
        t0 = time.time()
        for i in range(args.steps):
            state, m = step(state, b, jax.random.fold_in(key, i))
        float(m["loss"])
        dt = (time.time() - t0) / args.steps
        print(json.dumps({
            "mode": "device_only", "batch": args.batch, "remat": args.remat,
            "ms_per_step": round(dt * 1e3, 1),
            "steps_per_s": round(1.0 / dt, 3),
        }))
        return

    from waveformer_tpu.data.dataset import MedicalDataset

    root = tempfile.mkdtemp(prefix="bench_train_")
    make_cases(root)
    ds = MedicalDataset(root, [f"case_{i}" for i in range(4)], unpack=True,
                        num_processes=1)

    class TimedTrainer(Trainer):
        epoch_secs: list = []

        def _train_epoch(self, loader):
            t0 = time.time()
            out = super()._train_epoch(loader)
            self.epoch_secs.append(time.time() - t0)
            return out

    logdir = tempfile.mkdtemp(prefix="bench_train_logs_")
    TimedTrainer.loss_readback_window = args.window
    trainer = TimedTrainer(
        model,
        max_epochs=args.epochs,
        batch_size=args.batch,
        val_every=10**9,
        num_steps_per_epoch=args.steps,
        patch_size=(128, 128, 128),
        logdir=logdir,
        num_workers=args.workers,
        augmentation=args.aug,
        resume=False,
    )
    trainer.train(ds, ds)
    times = trainer.epoch_secs
    warm = times[1:] or times
    sps = args.steps / (sum(warm) / len(warm))
    print(json.dumps({
        "mode": "pipeline", "aug": args.aug, "batch": args.batch,
        "window": args.window, "remat": args.remat,
        "workers": args.workers, "nproc_host": os.cpu_count(),
        "epoch_secs": [round(t, 1) for t in times],
        "warm_steps_per_s": round(sps, 3),
        "warm_ms_per_step": round(1e3 / sps, 1),
    }))


if __name__ == "__main__":
    main()
