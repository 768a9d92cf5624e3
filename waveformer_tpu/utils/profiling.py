"""Profiling hooks (SURVEY §5: replaces the reference's ad-hoc timers).

The reference's tracing surface is wall-clock epoch timers
(`light_training/trainer.py:435,480-481`), per-sample read/crop timers
(`base_data_loader.py:58-117`) and stubbed `flops()` methods. Here:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a real
    XLA/TPU trace (open with TensorBoard's profile plugin or Perfetto);
  * `Timer` — hierarchical wall-clock section timers with summaries (the
    data-pipeline analog of the reference's print_time instrumentation);
  * `device_time` — measures a jitted callable with true device sync via a
    device-resident loop + scalar readback. NOTE: on tunneled backends
    (axon) `block_until_ready` alone does NOT guarantee execution completed;
    this helper is the reliable way to time device code in this repo.
  * `estimate_flops` — XLA's cost-analysis FLOP count for a jitted fn (the
    working replacement for the reference's stubbed flops() methods).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('./tb_profile'): step(...)`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock sections with mean/total summaries."""

    def __init__(self):
        self._acc: Dict[str, list] = collections.defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "mean_s": float(np.mean(v)),
                "total_s": float(np.sum(v)),
                "count": len(v),
            }
            for k, v in self._acc.items()
        }

    def report(self) -> str:
        lines = []
        for k, s in sorted(self.summary().items()):
            lines.append(
                f"{k:30s} mean {s['mean_s'] * 1000:8.2f} ms  "
                f"total {s['total_s']:8.2f} s  (n={s['count']})"
            )
        return "\n".join(lines)


def device_time(
    fn: Callable, *args, iters: int = 8
) -> float:
    """Seconds per call of `fn(*args)` with genuine device completion.

    Wraps `fn` in a device-resident `lax.scan` whose carry perturbs the first
    array argument (prevents CSE), reduces the output to one scalar, and
    forces a host readback — correct even over RPC-tunneled backends where
    `block_until_ready` returns at enqueue time.
    """
    import jax
    import jax.numpy as jnp

    first = args[0]

    def many(*a):
        def body(c, _):
            out = fn(*((a[0] + c.astype(a[0].dtype) * 1e-6,) + a[1:]))
            leaf = jax.tree.leaves(out)[0]
            return c + 1.0, jnp.abs(leaf.astype(jnp.float32)).mean()

        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys.mean()

    mj = jax.jit(many)
    float(mj(*args))  # compile + warm
    t0 = time.perf_counter()
    float(mj(*args))
    return (time.perf_counter() - t0) / iters


def estimate_flops(fn: Callable, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs of the jitted `fn(*args)` (None if the
    backend does not expose cost analysis)."""
    import jax

    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops")) if analysis else None
    except Exception:
        return None
