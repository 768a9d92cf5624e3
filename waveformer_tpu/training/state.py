"""Train state and jitted step factory.

The reference's fp32 step with gradient clipping is
`light_training/trainer.py:451-471` (AdamW lr 1e-4 at `3_train.py:70`,
`clip_grad_norm_(12)` at `trainer.py:466`). Here the whole step — forward,
loss, backward, clip, AdamW update — is ONE jitted XLA program over the
device mesh: batch sharded on the `data` axis, params replicated, gradient
all-reduce inserted by the compiler over ICI (no DDP wrapper, no NCCL calls).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_optimizer(
    lr: float | optax.Schedule = 1e-4,
    weight_decay: float = 1e-2,
    grad_clip_norm: Optional[float] = 12.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (reference defaults)."""
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    return optax.chain(*chain)


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted `(state, batch, rng) -> (state, metrics)` step.

    `apply_fn(params, image, deterministic, rngs)` → logits;
    `loss_fn(logits, label)` → scalar.
    With a mesh, inputs/outputs get sharding constraints: batch over `data`,
    state replicated. Buffer donation recycles the old state's HBM.
    """

    def step(state: TrainState, batch: Dict[str, jax.Array], rng) -> Tuple:
        image, label = batch["data"], batch["seg"]

        def compute_loss(params):
            logits = apply_fn(
                params, image, deterministic=False, rngs={"dropout": rng}
            )
            return loss_fn(logits, label)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from waveformer_tpu.parallel.mesh import batch_spec

    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.jit(
        step,
        in_shardings=(replicated, {"data": batch_sharding, "seg": batch_sharding},
                      replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(apply_fn: Callable, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted deterministic forward returning logits."""

    def step(params, image):
        return apply_fn(params, image, deterministic=True)

    if mesh is None:
        return jax.jit(step)
    from waveformer_tpu.parallel.mesh import batch_spec

    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.jit(
        step, in_shardings=(replicated, batch_sharding),
        out_shardings=batch_sharding,
    )
