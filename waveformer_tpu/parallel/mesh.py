"""Device-mesh and sharding utilities (the framework's parallelism layer).

The reference's entire distributed surface is single-node NCCL data
parallelism (SURVEY.md §2.9: DDP wrap `light_training/trainer.py:355-358`,
torchrun launcher `launch.py:69-117`, SyncBatchNorm, eval all-gather).

TPU-native redesign: ONE logical device mesh (`jax.sharding.Mesh`) with named
axes, and `NamedSharding` annotations instead of per-rank processes:

  * `data`    — batch-dim sharding ≡ DDP; gradient all-reduce happens inside
                the jitted step as XLA collectives over ICI.
  * `spatial` — sequence/context axis: shards the D (depth) spatial dim of a
                volume across devices for activations too large for one chip
                (the analog the reference lacks entirely; see SURVEY.md §5
                long-context discussion).
  * `tensor`  — Megatron-style column/row sharding of the attention/FFN
                weights for larger model variants: see
                `parallel.tensor_sharding.shard_params_tensor`
                (equivalence-tested in tests/test_tensor_sharding.py).

Multi-host init is `jax.distributed.initialize()` (one process per host) —
no torchrun-style re-exec, no rendezvous env plumbing. The live path is
proven by `tests/test_multihost.py`: two OS processes (4 virtual CPU devices
each) rendezvous through a coordinator, train on one 8-device `data` mesh,
and reproduce the single-controller losses bit-for-bit. On real hardware the
same call discovers the TPU topology; per-process batch shards enter through
`jax.make_array_from_callback` exactly as in that test.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape; axes with size 1 are kept (cheap, explicit)."""

    data: int = 1
    spatial: int = 1
    tensor: int = 1

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "spatial", "tensor")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.spatial, self.tensor)

    def size(self) -> int:
        return int(np.prod(self.shape))


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a `Mesh`. With no spec, all devices go on the `data` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size() != len(devices):
        raise ValueError(
            f"mesh spec {spec.shape} needs {spec.size()} devices, "
            f"got {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(spec.shape)
    return Mesh(dev_array, spec.axis_names)


def default_mesh_for_batch(batch_size: int,
                           devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Data-parallel mesh over the largest device count dividing the batch."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while batch_size % n != 0:
        n -= 1
    return make_mesh(MeshSpec(data=n), devices[:n])


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for (B, D, H, W, C) batches: batch over `data`,
    depth over `spatial` when that axis is >1."""
    spatial = "spatial" if mesh.shape.get("spatial", 1) > 1 else None
    return P("data", spatial)


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with batch-dim (+ optional depth) sharding."""
    sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
