"""Capture a device trace of one module and print the top HLO ops by time.

python -u tools/trace_module.py --which up4 --batch 8
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def top_ops(trace_dir, n=24, category=""):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))
    # find TPU pids (process_name metadata containing 'TPU' / device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    agg = collections.defaultdict(float)
    cat = {}
    longn = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        agg[name] += dur
        cat[name] = args.get("hlo_category", "")
        ln = args.get("long_name", "")
        if ln:
            longn[name] = ln
        total += dur
    print(f"total device time {total:.2f} ms across {len(agg)} ops")
    by_cat = collections.defaultdict(float)
    for name, dur in agg.items():
        by_cat[cat[name] or "?"] += dur
    for c, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  category {c:30s} {dur:9.3f} ms")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    if category:
        items = [kv for kv in items if category in cat[kv[0]]]
    for name, dur in items[:n]:
        print(f"{dur:9.3f} ms  [{cat[name][:24]:24s}] {name[:60]}")
        if name in longn:
            print(f"             {longn[name][:360]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="up4")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--category", default="", help="filter top list by hlo_category substring")
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    path = os.path.expanduser("~/.cache/wftpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from waveformer_tpu.models.layers import ProjectionUpsample
    from waveformer_tpu.models.conv_blocks import (
        UnetrBasicBlock, UnetrUpBlock,
    )

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    if args.which == "up4":
        mod = ProjectionUpsample(192, 48, stride=4, residual=True,
                                 use_double_conv=True, dtype=dt)
        xs = [jax.random.normal(key, (B, 16, 16, 16, 192), dt)]
    elif args.which == "up3":
        mod = ProjectionUpsample(96, 48, stride=2, residual=True, dtype=dt)
        xs = [jax.random.normal(key, (B, 32, 32, 32, 96), dt)]
    elif args.which == "dec1":
        mod = UnetrUpBlock(48, dtype=dt)
        xs = [jax.random.normal(key, (B, 64, 64, 64, 144), dt),
              jax.random.normal(key, (B, 128, 128, 128, 48), dt)]
    elif args.which == "enc0":
        mod = UnetrBasicBlock(48, cf_in=True, dtype=dt)
        xs = [jax.random.normal(key, (B, 4, 128, 128, 128), dt)]
    elif args.which == "stage1":
        from waveformer_tpu.models.blocks import WaveFormerBlock

        mod = WaveFormerBlock(
            dim=48, num_heads=3, level=3, img_size=(64, 64, 64),
            mlp_ratio=4, ms_attention=True, drop_path=0.0, dtype=dt,
        )
        xs = [jax.random.normal(key, (B, 64, 64, 64, 48), dt)]
    elif args.which == "model":
        from waveformer_tpu.config import Config
        from waveformer_tpu.models import create_waveformer

        cfg = Config()
        mod = create_waveformer(
            cfg.network.model_kwargs(), dtype=dt,
            io_layout="channels_first",
        )
        xs = [jax.random.normal(key, (B, 4, 128, 128, 128), dt)]
    else:
        raise SystemExit(f"unknown --which {args.which}")

    params = mod.init(jax.random.PRNGKey(1), *[a[:1] for a in xs])
    fn = jax.jit(lambda p, *a: mod.apply(p, *a))
    jax.tree.leaves(fn(params, *xs))[0].block_until_ready()  # compile

    tmp = tempfile.mkdtemp(prefix=f"trace_{args.which}_")
    jax.profiler.start_trace(tmp)
    for _ in range(args.reps):
        out = fn(params, *xs)
    jax.tree.leaves(out)[0].block_until_ready()
    jax.profiler.stop_trace()
    print(f"[{args.which}] trace in {tmp}; per-rep divide by {args.reps}")
    top_ops(tmp, n=args.top, category=args.category)


if __name__ == "__main__":
    main()
