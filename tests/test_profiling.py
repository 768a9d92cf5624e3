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
