"""Child process for the multi-host rendezvous smoke test.

Run by `tests/test_multihost.py` as one of N processes:

    python tests/multihost_child.py <coordinator> <num_processes> <process_id>

Each process owns 4 virtual CPU devices (`xla_force_host_platform_device_count`,
set by the parent); `jax.distributed.initialize` joins them into one 8-device
global mesh — the JAX-native replacement for the reference's torchrun+NCCL
bootstrap (`light_training/launch.py:69-117`). Process 0 prints a JSON line
with the per-step losses so the parent can assert equality with a
single-process run of the same program.
"""

import json
import sys


def build_model():
    import flax.linen as nn

    class TinyNet(nn.Module):
        out: int = 3

        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            x = nn.Conv(8, (3, 3, 3))(x)
            x = nn.relu(x)
            return nn.Conv(self.out, (1, 1, 1))(x)

    return TinyNet()


def make_global_batch():
    """Deterministic global batch (8, 8, 8, 8, 2) + labels — identical in
    every process and in the single-process oracle."""
    import numpy as np

    rng = np.random.default_rng(42)
    data = rng.standard_normal((8, 8, 8, 8, 2)).astype(np.float32)
    seg = rng.integers(0, 3, (8, 8, 8, 8, 1)).astype(np.int32)
    return data, seg


def run_steps(mesh, n_steps: int = 3):
    """The shared program: init → shard the global batch over `data` →
    train steps. Every process computes identical initial params (same
    seed) and assembles global arrays via `make_array_from_callback`, the
    standard multi-controller input path. Returns per-step losses. Used by
    BOTH the multi-process children and the in-process oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from waveformer_tpu.training.losses import dice_ce_loss
    from waveformer_tpu.training.state import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    model = build_model()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 2))
    )
    state = TrainState.create(params, make_optimizer(lr=1e-2))

    replicated = NamedSharding(mesh, P())

    def to_global(a, sharding):
        host = np.asarray(a)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    state = jax.tree.map(lambda a: to_global(a, replicated), state)

    data, seg = make_global_batch()
    batch_sharding = NamedSharding(mesh, P("data"))
    batch = {
        "data": to_global(data, batch_sharding),
        "seg": to_global(seg, batch_sharding),
    }

    step = make_train_step(
        model.apply, lambda logits, s: dice_ce_loss(logits, s), mesh=mesh
    )
    losses = []
    for i in range(n_steps):
        rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    return losses


def main() -> None:
    coordinator, num_processes, process_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * num_processes

    from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    losses = run_steps(mesh)
    if process_id == 0:
        print(json.dumps({"losses": losses}), flush=True)


if __name__ == "__main__":
    main()
