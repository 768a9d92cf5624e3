"""Cross-device collective helpers (the §2.9 parity surface).

Covers the reference's distributed mechanisms with their TPU-native forms:

  * `sync_batch_norm` — BatchNorm statistics psum-ed over the mesh `data`
    axis ≡ `SyncBatchNorm.convert_sync_batchnorm`
    (`light_training/trainer.py:354`) / the lib `syncbn` CUDA extension.
  * `all_gather_with_grad` — differentiable all-gather whose backward is the
    (collective) gradient slice ≡ nnUNet's `AllGatherGrad`
    (`light_training/loss/ddp_allgather.py:25-48`). In JAX this is just
    `jax.lax.all_gather` — its VJP is already `psum_scatter`; exposed here
    for discoverability and parity testing.
  * `gather_metrics` — eval-result gather + truncate ≡
    `SequentialDistributedSampler` + `distributed_concat`
    (`light_training/sampler.py:5-48`).
  * `cross_replica_mean` — the gradient/metric all-reduce primitive.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def cross_replica_mean(x: jax.Array, axis_name: str = "data") -> jax.Array:
    return jax.lax.pmean(x, axis_name)


def all_gather_with_grad(
    x: jax.Array, axis_name: str = "data"
) -> jax.Array:
    """Differentiable all-gather (stacks an axis of size mesh[axis])."""
    return jax.lax.all_gather(x, axis_name)


def gather_metrics(values: jax.Array, axis_name: str = "data") -> jax.Array:
    """Gather per-device eval metric rows into the full array (use inside
    `shard_map`/`pmap`); equivalent of `distributed_concat`."""
    g = jax.lax.all_gather(values, axis_name)
    return g.reshape((-1,) + g.shape[2:])


class SyncBatchNorm(nn.Module):
    """BatchNorm3d with cross-replica statistics.

    Inside a sharded computation (shard_map / pmap with `axis_name` bound),
    batch statistics are psum-ed over the data axis so every replica
    normalizes with GLOBAL batch moments — the semantics DDP gets from
    `SyncBatchNorm.convert_sync_batchnorm`. Outside a collective context
    (axis_name=None) it degrades to plain BatchNorm.
    """

    features: int
    axis_name: Optional[str] = "data"
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            mean2 = jnp.mean(x32**2, axis=axes)
            if self.axis_name is not None:
                try:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                except NameError:
                    pass  # axis not bound: single-replica fallback
            var = jnp.maximum(mean2 - mean**2, 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


def shard_cases_for_eval(
    n_cases: int, n_shards: int
) -> Tuple[np.ndarray, int]:
    """`SequentialDistributedSampler` logic (`sampler.py:5-41`): pad the case
    list to a multiple of the shard count and slice sequentially. Returns the
    (n_shards, per_shard) index matrix and the true (unpadded) length."""
    per_shard = -(-n_cases // n_shards)
    idx = np.arange(per_shard * n_shards) % max(n_cases, 1)
    return idx.reshape(n_shards, per_shard), n_cases
