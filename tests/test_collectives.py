"""Collective helpers: sync BN, all-gather grad, eval sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from waveformer_tpu.parallel.collectives import (
    SyncBatchNorm,
    all_gather_with_grad,
    gather_metrics,
    shard_cases_for_eval,
)


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


class TestSyncBatchNorm:
    def test_sharded_stats_match_global(self, rng):
        """Per-replica BN with psum stats must equal BN over the full batch
        (the SyncBatchNorm guarantee)."""
        x = rng.standard_normal((8, 4, 4, 4, 6)).astype(np.float32)
        # make per-shard distributions differ so the test is meaningful
        x[:4] += 3.0
        bn = SyncBatchNorm(features=6, axis_name="data")
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

        # global reference: single-device, no axis
        bn_local = SyncBatchNorm(features=6, axis_name=None)
        want, _ = bn_local.apply(
            variables, jnp.asarray(x), mutable=["batch_stats"]
        )

        mesh = _mesh(4)

        @jax.jit
        def run(xs):
            def inner(xs):
                y, _ = bn.apply(variables, xs, mutable=["batch_stats"])
                return y

            return jax.shard_map(
                inner, mesh=mesh, in_specs=P("data"), out_specs=P("data")
            )(xs)

        got = run(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_running_average_inference(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 3)), jnp.float32)
        bn = SyncBatchNorm(features=3, axis_name=None)
        variables = bn.init(jax.random.PRNGKey(0), x)
        y = bn.apply(variables, x, use_running_average=True)
        # init stats: mean 0 var 1 → identity up to affine init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


class TestGatherGrad:
    def test_all_gather_grad_is_slice(self, rng):
        """Backward of all_gather must route the cotangent slice back to the
        owning shard (AllGatherGrad semantics)."""
        mesh = _mesh(4)
        x = jnp.arange(8.0)

        @jax.jit
        def loss(v):
            def inner(vs):
                g = all_gather_with_grad(vs, "data")  # (4, 2)
                return jnp.sum(g.reshape(-1) ** 2)

            return jax.shard_map(
                inner, mesh=mesh, in_specs=P("data"), out_specs=P(),
                check_vma=False,
            )(v)

        # every element enters the (replicated) loss exactly once, so the
        # gathered-forward / scattered-backward pair must give d/dx = 2x
        grad = jax.grad(lambda v: loss(v))(x)
        np.testing.assert_allclose(np.asarray(grad), 2 * np.arange(8.0),
                                   rtol=1e-6)

    def test_gather_metrics_roundtrip(self, rng):
        mesh = _mesh(4)
        vals = jnp.arange(12.0).reshape(12, 1)

        @jax.jit
        def run(v):
            def inner(vs):
                return gather_metrics(vs, "data")

            return jax.shard_map(
                inner, mesh=mesh, in_specs=P("data"), out_specs=P(),
                check_vma=False,
            )(v)

        out = run(vals)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vals))


class TestEvalSharding:
    def test_pad_and_slice(self):
        idx, n = shard_cases_for_eval(10, 4)
        assert idx.shape == (4, 3)
        assert n == 10
        flat = idx.reshape(-1)
        assert set(flat[:10].tolist()) <= set(range(10))
        # padded entries wrap around (truncated after gather like the
        # reference's distributed_concat)
        assert (flat >= 0).all() and (flat < 10).all()
