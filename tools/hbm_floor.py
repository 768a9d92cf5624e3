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
    r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\],\s]+?))\s*"
    r"([\w\-]+)\((.*)$"
)
_OPERAND_RE = re.compile(r"(%[\w.\-]+)|(?<=\()([\w.\-]+)(?=[,)])")

_SKIP_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "partition-id", "replica-id",
}

_BRACE_RE = re.compile(r"\{[^{}]*\}")


def _strip_braces(line: str) -> str:
    """Remove {...} blocks (layouts incl. tiling like `{4,3,2,1,0:T(8,128)}`,
    elided constants, metadata). TPU tiling annotations contain parenthesised
    groups that otherwise parse as instruction calls named `T`/`S`."""
    prev = None
    while prev != line:
        prev = line
        line = _BRACE_RE.sub("", line)
    return line


def _parse_instr(line: str):
    """(name, op, result_bytes, operands, rest_after_args) or None."""
    clean = _strip_braces(line)
    im = _INSTR_RE.match(clean)
    if not im:
        return None
    name, type_str, op, rest = im.groups()
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
    operands = re.findall(r"%?([\w.\-]+)", rest[:args_end])
    return (
        name.lstrip("%"),
        op,
        shape_bytes(type_str),
        operands,
        rest[args_end + 1:],
    )


def parse_computations(hlo_text: str):
    """name -> {"instrs": [...], "root": instr, "by_name": {...}}.

    The ENTRY computation is stored under the key "ENTRY" as well as its
    own name."""
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        hm = re.match(r"^(ENTRY\s+)?%([\w.\-]+)\s*\(.*->.*\{\s*$", line)
        if hm:
            cur = {"instrs": [], "root": None, "by_name": {}}
            comps[hm.group(2)] = cur
            if hm.group(1):
                comps["ENTRY"] = cur
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        instr = _parse_instr(line)
        if instr is None:
            continue
        cur["instrs"].append(instr)
        cur["by_name"][instr[0]] = instr
        if line.lstrip().startswith("ROOT"):
            cur["root"] = instr
    return comps


def _trip_count(cond: dict, default: int) -> int:
    """Trip count of a while loop: the integer bound in its condition
    (`compare(%iv, %constant(N)), direction=LT`)."""
    best = None
    for name, op, _, operands, rest in cond["instrs"]:
        if op != "constant":
            continue
        joined = ",".join(operands) or ""
        m = re.match(r"^\s*(\d+)\s*$", joined)
        if m:
            v = int(m.group(1))
            best = v if best is None else max(best, v)
    return best if best is not None else default


def _fusion_dus_update_bytes(fc: dict):
    """If a fused computation's ROOT is an in-place dynamic-update-slice
    (the scan write-back pattern), return the update operand's bytes —
    the fusion's TRUE write traffic (output buffer aliases the carry)."""
    root = fc.get("root")
    if root is None or root[1] != "dynamic-update-slice":
        return None
    ops = root[3]
    if len(ops) < 2:
        return None
    upd = fc["by_name"].get(ops[1])
    return upd[2] if upd else None


def comp_traffic(comps, name, default_trip=8, _depth=0):
    """(write_bytes, read_bytes, by_category) of one computation, counting
    while-loop bodies at their trip count. Fusion interiors are NOT walked
    (on-chip); in-place scan write-backs are charged at the update size."""
    writes = reads = 0.0
    by_cat = {}
    comp = comps[name]
    sizes = {n: i[2] for n, i in comp["by_name"].items()}

    def add(cat, w, r):
        nonlocal writes, reads
        writes += w
        reads += r
        by_cat.setdefault(cat, [0.0, 0.0])
        by_cat[cat][0] += w
        by_cat[cat][1] += r

    for iname, op, rbytes, operands, rest in comp["instrs"]:
        if op in _SKIP_OPS:
            continue
        if op in ("copy-done", "async-done", "async-update"):
            continue  # paired with their -start, counted there
        if op == "while":
            bm = re.search(r"body=%([\w.\-]+)", rest)
            cm = re.search(r"condition=%([\w.\-]+)", rest)
            if bm and bm.group(1) in comps and _depth < 4:
                trip = (
                    _trip_count(comps[cm.group(1)], default_trip)
                    if cm and cm.group(1) in comps
                    else default_trip
                )
                _, _, bcat = comp_traffic(
                    comps, bm.group(1), default_trip, _depth + 1
                )
                for c, (cw, cr) in bcat.items():
                    add(f"while[{trip}x]:{c}", cw * trip, cr * trip)
            continue  # the while's own I/O aliases its carry — no traffic
        distinct = [o for o in dict.fromkeys(operands) if o in sizes]
        if op == "dynamic-slice":
            add(op, rbytes, rbytes)  # reads only the slice it produces
            continue
        if op == "dynamic-update-slice":
            upd = sizes.get(operands[1], 0.0) if len(operands) > 1 else 0.0
            add(op, upd, upd)  # in-place: slice write + update read
            continue
        if op in ("copy-start", "async-start"):
            moved = sum(sizes[o] for o in distinct)
            add(op, moved, moved)
            continue
        w, r = rbytes, sum(sizes[o] for o in distinct)
        if op == "fusion":
            fm = re.search(r"calls=%([\w.\-]+)", rest)
            fc = comps.get(fm.group(1)) if fm else None
            if fc is not None:
                upd = _fusion_dus_update_bytes(fc)
                if upd is not None:
                    # in-place scan write-back fusion: write the update
                    # slice, do not read the aliased carry operand
                    w = upd
                    aliased = None
                    for o in distinct:
                        if abs(sizes[o] - rbytes) < 1e-6:
                            aliased = o
                            break
                    if aliased is not None:
                        r -= sizes[aliased]
        add("fusion" if op == "fusion" else op, w, r)
    return writes, reads, by_cat


def entry_traffic(hlo_text: str):
    """(write_bytes, read_bytes, per-op breakdown) for the whole program:
    the ENTRY region plus while-loop bodies at their trip counts
    (fusion interiors excluded; in-place scan write-backs at update size)."""
    comps = parse_computations(hlo_text)
    if "ENTRY" not in comps:
        raise ValueError("no ENTRY computation found")
    return comp_traffic(comps, "ENTRY")


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
