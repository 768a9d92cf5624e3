"""Step 3 — train WaveFormer on preprocessed data (reference `3_train.py`).

One controller process drives the whole device mesh; no torchrun/launcher.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from waveformer_tpu.config import load_config
from waveformer_tpu.data.dataset import get_train_val_test_loader_from_train
from waveformer_tpu.models import create_waveformer
from waveformer_tpu.training.trainer import Trainer
from waveformer_tpu.utils.determinism import set_determinism
from waveformer_tpu.utils.logger import setup_logging_from_config, get_logger




def _enable_compilation_cache():
    """Persist XLA compilations across runs (the TTA sliding-window program
    alone compiles for minutes); opt out with WFTPU_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("WFTPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "WFTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/wftpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() (one process/host)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for debugging)")
    ap.add_argument(
        "--plans", default=None,
        help="plans.json written by wtpu-preprocess; its patch size "
        "configures roi_size/img_size (the reference's plans-handler "
        "round-trip). Pass 'auto' to pick up <data_dir>/plans.json when "
        "present; default: config values only",
    )
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        jax.distributed.initialize()

    cfg = load_config(args.config)
    setup_logging_from_config(cfg.logging)
    log = get_logger()
    set_determinism(cfg.seed)

    if args.plans:
        from waveformer_tpu.data.planning import Plans

        plans = (
            Plans.find(cfg.data_dir)
            if args.plans == "auto"
            else Plans.load(args.plans)
        )
        if plans is not None and "patch_size" in plans.raw:
            cfg = plans.apply_to_config(cfg)
            log.info(
                f"plans: patch {plans.patch_size} -> network "
                f"{cfg.network.img_size}, spacing {plans.target_spacing}"
            )
        elif args.plans != "auto":
            ap.error(f"--plans {args.plans}: no usable patch_size")

    train_ds, val_ds, _ = get_train_val_test_loader_from_train(
        cfg.data_dir,
        test_list_path=os.path.join(cfg.data_list_path, "test_list.pkl"),
        split_dir=os.path.join(cfg.data_list_path, cfg.split_path),
    )
    log.info(f"train {len(train_ds)} / val {len(val_ds)} cases")

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = create_waveformer(cfg.network.model_kwargs(), dtype=dtype)
    trainer = Trainer(
        model,
        max_epochs=cfg.max_epoch,
        batch_size=cfg.batch_size,
        val_every=cfg.val_every,
        num_steps_per_epoch=cfg.num_steps_per_epoch,
        val_patches_per_epoch=cfg.val_patches_per_epoch,
        patch_size=cfg.roi_size,
        lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        grad_clip_norm=cfg.grad_clip_norm,
        scheduler=cfg.scheduler,
        warmup_epochs=cfg.warmup_epochs,
        logdir=cfg.logdir,
        model_name=cfg.model_name,
        num_workers=cfg.train_process,
        full_val_every=cfg.full_val_every,
        full_val_cases=cfg.full_val_cases,
        label_mode=cfg.extra.get("label_mode", "brats"),
        num_classes=cfg.network.out_channels,
        seed=cfg.seed,
        resume=not args.no_resume,
    )
    best = trainer.train(train_ds, val_ds)
    log.info(f"training done; best mean dice {best:.4f}")


if __name__ == "__main__":
    main()
