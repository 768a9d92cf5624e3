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
