"""Step 4 — full-volume test-set inference (reference `4_predict.py`).

Loads the best checkpoint, runs mirror-TTA sliding-window inference per test
case, restores original geometry, writes `{case}.nii.gz` predictions.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.config import load_config
from waveformer_tpu.data.dataset import get_train_val_test_loader_from_train
from waveformer_tpu.inference import Predictor, SlidingWindowInferer
from waveformer_tpu.models import create_waveformer
from waveformer_tpu.training.checkpoint import load_params_npz
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
    ap.add_argument("--checkpoint", default=None,
                    help="params .npz (default: best_model in logdir/model)")
    ap.add_argument("--split", choices=("test", "val"), default="test")
    ap.add_argument(
        "--tta", type=int, choices=(1, 2, 4, 8), default=None,
        help="mirror-TTA orientations per case (protocol knob; overrides "
        "config). 8 = reference parity protocol (~4.0x per-case cost on "
        "v5e, BENCH_NOTES.md); 1 = no TTA (the <60 s serving mode)",
    )
    ap.add_argument("--no-tta", action="store_true",
                    help="alias for --tta 1")
    ap.add_argument(
        "--sharded", choices=("auto", "on", "off"), default="auto",
        help="shard whole cases across all visible devices over the mesh "
             "data axis (Predictor.predict_cases_sharded); 'auto' shards "
             "when more than one device is visible",
    )
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for debugging)")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = load_config(args.config)
    setup_logging_from_config(cfg.logging)
    log = get_logger()
    set_determinism(cfg.seed)

    train_ds, val_ds, test_ds = get_train_val_test_loader_from_train(
        cfg.data_dir,
        test_list_path=os.path.join(cfg.data_list_path, "test_list.pkl"),
        split_dir=os.path.join(cfg.data_list_path, cfg.split_path),
    )
    ds = test_ds if args.split == "test" else val_ds
    log.info(f"predicting {len(ds)} {args.split} cases")

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # channels-first end to end: preprocessed volumes are stored (C, D, H, W)
    # — no host transpose, and the cf model/stitch measure ~8% faster on TPU
    model = create_waveformer(
        cfg.network.model_kwargs(), dtype=dtype, io_layout="channels_first"
    )

    ckpt_path = args.checkpoint
    if ckpt_path is None:
        from waveformer_tpu.training.checkpoint import CheckpointManager

        ckpt_path = CheckpointManager(
            os.path.join(cfg.logdir, "model")
        ).find_best()
    if ckpt_path is None:
        ap.error("no checkpoint found; pass --checkpoint")
    log.info(f"loading {ckpt_path}")
    params = jax.tree.map(jnp.asarray, load_params_npz(ckpt_path))

    predict_fn = lambda patches: model.apply(params, patches)
    pred_cfg = cfg.prediction
    if args.no_tta:
        args.tta = 1
    if args.tta is not None:
        import dataclasses

        pred_cfg = dataclasses.replace(pred_cfg, tta_orientations=args.tta)
    mirror_axes = pred_cfg.effective_mirror_axes()
    log.info(
        f"TTA protocol: {2 ** len(mirror_axes or ())} orientation(s) "
        f"(mirror_axes={mirror_axes})"
    )
    inferer = SlidingWindowInferer(
        roi_size=cfg.prediction.patch_size,
        sw_batch_size=cfg.prediction.sw_batch_size,
        overlap=cfg.prediction.overlap,
        mirror_axes=mirror_axes,
        layout="channels_first",
        tta_mode="patch",
    )
    predictor = Predictor(inferer, upload_dtype=dtype)
    out_dir = cfg.prediction.prediction_save
    os.makedirs(out_dir, exist_ok=True)

    t_start = time.time()
    items = [ds[i] for i in range(len(ds))]
    n_dev = len(jax.devices())
    use_sharded = args.sharded == "on" or (
        args.sharded == "auto" and n_dev > 1
    )
    # preprocessed volumes are already (C, D, H, W) — feed them straight in
    # (memmap-backed; both paths materialize per case, not up front)
    if use_sharded:
        # case-parallel over the mesh `data` axis: each device runs the
        # full TTA sliding-window program on its own case (the reference's
        # eval sharding + gather, `light_training/sampler.py:5-48`)
        from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec(data=n_dev))
        log.info(f"case-sharded inference over {n_dev} devices")
        segs = (
            seg
            for _, seg in predictor.predict_cases_sharded(
                [it["data"] for it in items],
                predict_fn,
                out_channels=cfg.network.out_channels,
                properties_list=[it["properties"] for it in items],
                mesh=mesh,
            )
        )
    else:
        segs = predictor.predict_cases(
            (np.asarray(it["data"]) for it in items),
            predict_fn,
            out_channels=cfg.network.out_channels,
            properties_list=[it["properties"] for it in items],
        )
    t0 = time.time()
    for item, seg in zip(items, segs):
        predictor.save_to_nii(
            seg,
            os.path.join(out_dir, item["name"] + ".nii.gz"),
            spacing=cfg.prediction.raw_spacing,
            properties=item["properties"],
        )
        log.info(f"{item['name']}: {time.time() - t0:.1f}s")
        t0 = time.time()
    dt = time.time() - t_start
    n = max(len(ds), 1)
    log.info(
        f"done: {len(ds)} cases in {dt:.1f}s "
        f"({n / dt:.3f} cases/s)"
    )


if __name__ == "__main__":
    main()
