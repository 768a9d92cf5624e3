"""Profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.utils.profiling import Timer, device_time, estimate_flops


def test_timer_sections():
    import time

    t = Timer()
    with t.section("a"):
        time.sleep(0.01)
    with t.section("a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert "a" in t.report()


def test_device_time_positive(rng):
    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    dt = device_time(lambda v: v @ v, x, iters=4)
    assert dt > 0


def test_estimate_flops_matmul(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    f = estimate_flops(lambda v: v @ v, x)
    if f is not None:  # backend-dependent
        assert f >= 2 * 32**3 * 0.5


class TestHBMFloorParser:
    """The dedup-across-fusions HLO traffic parser (tools/hbm_floor.py)
    counts fusion-boundary bytes correctly on a known program."""

    def test_entry_traffic_known_program(self):
        import os
        import sys

        import jax
        import jax.numpy as jnp

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "tools"),
        )
        try:
            from hbm_floor import entry_traffic, shape_bytes
        finally:
            sys.path.pop(0)

        assert shape_bytes("bf16[8,16,48]{2,1,0}") == 8 * 16 * 48 * 2
        assert shape_bytes("(f32[2,3]{1,0}, s8[4]{0})") == 24 + 4

        # TPU tiled-layout annotations contain parenthesised groups that a
        # naive parser reads as calls to ops named "T"/"S"
        from hbm_floor import _parse_instr

        instr = _parse_instr(
            "  %fusion.1 = bf16[8,48,128]{2,1,0:T(8,128)(2,1)S(1)} "
            "fusion(%p0, %add.5), kind=kLoop, calls=%fused_computation.1"
        )
        assert instr is not None
        name, op, rbytes, operands, _rest = instr
        assert (name, op) == ("fusion.1", "fusion")
        assert rbytes == 8 * 48 * 128 * 2
        assert operands == ["p0", "add.5"]

        def f(a, b):
            return jnp.tanh(jnp.dot(a, b)) + a

        a = jnp.zeros((128, 128), jnp.float32)
        b = jnp.zeros((128, 128), jnp.float32)
        hlo = jax.jit(f).lower(a, b).compile().as_text()
        w, r, by_cat = entry_traffic(hlo)
        buf = 128 * 128 * 4
        # at minimum: the dot writes its result and reads both operands;
        # the add/tanh consumer writes the output and re-reads inputs
        assert w >= 2 * buf
        assert r >= 3 * buf
        # bookkeeping ops must not be charged
        assert "parameter" not in by_cat and "tuple" not in by_cat

    def test_while_bodies_counted_at_trip_count(self):
        import os
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "tools"),
        )
        try:
            from hbm_floor import entry_traffic
        finally:
            sys.path.pop(0)

        # a scan-shaped program: the body's fusion traffic must be charged
        # 8x; the in-place dynamic-update-slice write-back at update size;
        # the while's own carry I/O not at all
        hlo = """\
%body.1 (arg.1: (s32[], f32[8,64]{1,0:T(8,128)}, f32[64]{0})) -> (s32[], f32[8,64], f32[64]) {
  %arg.1 = (s32[]{:T(128)}, f32[8,64]{1,0:T(8,128)}, f32[64]{0}) parameter(0)
  %iv = s32[]{:T(128)} get-tuple-element(%arg.1), index=0
  %carry = f32[8,64]{1,0:T(8,128)} get-tuple-element(%arg.1), index=1
  %x = f32[64]{0} get-tuple-element(%arg.1), index=2
  %y = f32[64]{0:T(128)} fusion(%x), kind=kLoop, calls=%fused_mul
  %upd = f32[1,64]{1,0} reshape(%y)
  %c0 = s32[]{:T(128)} constant(0)
  %wb = f32[8,64]{1,0:T(8,128)} dynamic-update-slice(%carry, %upd, %iv, %c0)
  %one = s32[]{:T(128)} constant(1)
  %next = s32[]{:T(128)} add(%iv, %one)
  ROOT %out = (s32[]{:T(128)}, f32[8,64]{1,0:T(8,128)}, f32[64]{0}) tuple(%next, %wb, %x)
}

%cond.1 (arg.2: (s32[], f32[8,64]{1,0:T(8,128)}, f32[64]{0})) -> pred[] {
  %arg.2 = (s32[]{:T(128)}, f32[8,64]{1,0:T(8,128)}, f32[64]{0}) parameter(0)
  %iv.2 = s32[]{:T(128)} get-tuple-element(%arg.2), index=0
  %n = s32[]{:T(128)} constant(8)
  ROOT %lt = pred[]{:T(512)} compare(%iv.2, %n), direction=LT
}

ENTRY %main.1 (p0.1: f32[8,64], p1.1: f32[64]) -> f32[8,64] {
  %p0.1 = f32[8,64]{1,0:T(8,128)} parameter(0)
  %p1.1 = f32[64]{0} parameter(1)
  %c.0 = s32[]{:T(128)} constant(0)
  %t = (s32[]{:T(128)}, f32[8,64]{1,0:T(8,128)}, f32[64]{0}) tuple(%c.0, %p0.1, %p1.1)
  %loop = (s32[]{:T(128)}, f32[8,64]{1,0:T(8,128)}, f32[64]{0}) while(%t), condition=%cond.1, body=%body.1
  ROOT %res = f32[8,64]{1,0:T(8,128)} get-tuple-element(%loop), index=1
}
"""
        w, r, by_cat = entry_traffic(hlo)
        f64b = 64 * 4
        # per iteration: fusion w+r = 64 floats each way; reshape w+r;
        # dus w+r at UPDATE size (not the 8x64 carry); x8 iterations
        assert by_cat["while[8x]:fusion"] == [8 * f64b, 8 * f64b]
        assert by_cat["while[8x]:dynamic-update-slice"] == [
            8 * f64b, 8 * f64b
        ]
        # the while carry itself contributes nothing at ENTRY
        assert "while" not in by_cat
        # fusion + reshape + dus (+ the 4-byte iv add), 8 iters
        assert w == 3 * 8 * f64b + 8 * 4
        assert r == 3 * 8 * f64b + 8 * 8
