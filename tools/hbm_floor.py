"""Dedup-across-fusions HBM traffic estimate for the flagship forward
(VERDICT r4 #2: pin down the TRUE HBM floor behind the ceiling claim).

XLA's `cost_analysis()["bytes accessed"]` sums, per top-level op, full
operand + result bytes. Two known distortions for a roofline floor:

  * convolutions are costed with their full logical operand sizes even
    when the lowered loop re-reads/streams differently — and a fusion
    that consumes only a SLICE of a producer is still charged the full
    operand;
  * ops that are pure layout bookkeeping at HBM (bitcast, tuple plumbing)
    can be charged as traffic.

This tool parses the optimized HLO ENTRY computation (post-fusion,
post-layout) and counts, per top-level instruction:

    writes: its own result buffer, once
    reads:  each DISTINCT operand buffer, once per consuming instruction
            (a re-read by another fusion is real HBM traffic on TPU —
            there is no inter-fusion cache)

skipping parameter/constant/tuple/get-tuple-element/bitcast. That is the
exact HBM traffic of the program AT ITS CURRENT fusion boundaries under
ideal overlap — the number the 819 GB/s roofline should divide.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/hbm_floor.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import re


_DTYPE_BYTES = {
    "pred": 1, "s4": 0.5, "s8": 1, "s16": 2, "s32": 4, "s64": 8,
    "u4": 0.5, "u8": 1, "u16": 2, "u32": 4, "u64": 8,
    "f8e4m3fn": 1, "f8e5m2": 1, "bf16": 2, "f16": 2, "f32": 4, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> float:
    """Bytes of an HLO type string; tuples sum their components."""
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\],{}:#*\s/]+?))\s*"
    r"([\w\-]+)\((.*)$"
)
_OPERAND_RE = re.compile(r"(%[\w.\-]+)|(?<=\()([\w.\-]+)(?=[,)])")

_SKIP_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "partition-id", "replica-id",
}


def entry_traffic(hlo_text: str):
    """(write_bytes, read_bytes, per-op breakdown) for the ENTRY region."""
    # grab the ENTRY computation body
    m = re.search(r"^ENTRY [^\{]*\{(.*?)^\}", hlo_text, re.S | re.M)
    if not m:
        raise ValueError("no ENTRY computation found")
    body = m.group(1)
    # first pass: result types per instruction name
    sizes = {}
    parsed = []
    for line in body.splitlines():
        im = _INSTR_RE.match(line)
        if not im:
            continue
        name, type_str, op, rest = im.groups()
        name = name.lstrip("%")
        sizes[name] = shape_bytes(type_str)
        # operand names: everything up to the closing paren of the arg list
        depth, args_end = 1, len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args_end = i
                    break
        operand_names = re.findall(r"%?([\w.\-]+)", rest[:args_end])
        parsed.append((name, op, operand_names))
    writes = reads = 0.0
    by_cat = {}
    for name, op, operands in parsed:
        if op in _SKIP_OPS:
            continue
        w = sizes.get(name, 0.0)
        r = sum(
            sizes[o] for o in dict.fromkeys(operands) if o in sizes
        )
        writes += w
        reads += r
        cat = op if op != "fusion" else "fusion"
        by_cat.setdefault(cat, [0.0, 0.0])
        by_cat[cat][0] += w
        by_cat[cat][1] += r
    return writes, reads, by_cat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import os

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.path.expanduser("~/.cache/wftpu_xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mfu_report import V5E_HBM_PEAK_GBPS, flagship_model

    fwd, params, x = flagship_model(args.batch)
    compiled = jax.jit(fwd).lower(x, params).compile()
    hlo = compiled.as_text()

    writes, reads, by_cat = entry_traffic(hlo)
    total = writes + reads
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    xla_bytes = float(analysis.get("bytes accessed", float("nan")))

    per_patch = total / args.batch
    out = {
        "batch": args.batch,
        "entry_write_gb": round(writes / 1e9, 2),
        "entry_read_gb": round(reads / 1e9, 2),
        "entry_total_gb": round(total / 1e9, 2),
        "xla_bytes_accessed_gb": round(xla_bytes / 1e9, 2),
        "dedup_vs_xla_ratio": round(total / xla_bytes, 3)
        if xla_bytes == xla_bytes else None,
        "per_patch_gb": round(per_patch / 1e9, 3),
        "hbm_floor_ms_per_patch": round(
            per_patch / (V5E_HBM_PEAK_GBPS * 1e9) * 1e3, 2
        ),
        "by_category_gb": {
            k: {"write": round(v[0] / 1e9, 2), "read": round(v[1] / 1e9, 2)}
            for k, v in sorted(
                by_cat.items(), key=lambda kv: -(kv[1][0] + kv[1][1])
            )
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
