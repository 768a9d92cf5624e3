"""Self-supervised pretraining: losses, augment ops, and the step-based trainer.

Equivalents of the reference SSL stack (`self_supervised/`):
  * `nt_xent` — SimCLR contrastive loss (`loss.py:6-61`), jnp;
  * `ssl_total_loss` — the reference's combination
    `contrast·recon + recon` (`loss.py:102`);
  * augment ops (`ops.py:17-122`): random block drop/replace, in-plane
    90° rotations with labels, context-restoration patch swaps (host numpy,
    run in the data pipeline);
  * `SSLTrainer` — step-based loop with warmup-cosine LR, periodic
    validation on held-out volumes (L1 recon), best-checkpoint tracking
    (`train.py:21-310` capability), mesh-sharded like the supervised
    trainer.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.parallel.mesh import default_mesh_for_batch, replicate, shard_batch
from waveformer_tpu.training.checkpoint import CheckpointManager
from waveformer_tpu.training.schedules import warmup_cosine_schedule
from waveformer_tpu.training.state import TrainState, make_optimizer
from waveformer_tpu.utils.logger import SummaryWriter, get_logger


# --------------------------------------------------------------------------- #
# losses
# --------------------------------------------------------------------------- #


def nt_xent(
    z_i: jax.Array, z_j: jax.Array, temperature: float = 0.5
) -> jax.Array:
    """SimCLR NT-Xent over 2B embeddings (`loss.py:6-61` semantics)."""
    b = z_i.shape[0]
    z_i = z_i / (jnp.linalg.norm(z_i, axis=1, keepdims=True) + 1e-8)
    z_j = z_j / (jnp.linalg.norm(z_j, axis=1, keepdims=True) + 1e-8)
    z = jnp.concatenate([z_i, z_j], axis=0).astype(jnp.float32)
    sim = z @ z.T  # cosine similarities (already normalized)
    pos = jnp.concatenate(
        [jnp.diagonal(sim, offset=b), jnp.diagonal(sim, offset=-b)]
    )
    mask = 1.0 - jnp.eye(2 * b)
    denom = jnp.sum(mask * jnp.exp(sim / temperature), axis=1)
    return jnp.sum(-jnp.log(jnp.exp(pos / temperature) / denom)) / (2 * b)


def ssl_total_loss(
    c1, c2, rec1, rec2, gt1, gt2, temperature: float = 0.5,
    alpha_contrast: float = 1.0, alpha_recon: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """total = α_c · contrast · recon + α_r · recon (`loss.py:102`)."""
    contrast = nt_xent(c1, c2, temperature)
    rec = 0.5 * (
        jnp.mean(jnp.abs(rec1 - gt1)) + jnp.mean(jnp.abs(rec2 - gt2))
    )
    total = alpha_contrast * contrast * rec + alpha_recon * rec
    return total, {"contrast": contrast, "recon": rec}


# --------------------------------------------------------------------------- #
# augment ops (host numpy; reference `ops.py`)
# --------------------------------------------------------------------------- #


def patch_rand_drop(
    x: np.ndarray,
    x_rep: Optional[np.ndarray] = None,
    max_drop: float = 0.3,
    max_block_sz: float = 0.25,
    tolr: float = 0.05,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Random block erase/replace (`ops.py:17-44`); x is (C, D, H, W)."""
    rng = rng or np.random.RandomState()
    c, h, w, z = x.shape
    n_drop = rng.uniform(0, max_drop) * h * w * z
    mx = (int(h * max_block_sz), int(w * max_block_sz), int(z * max_block_sz))
    tol = (int(tolr * h), int(tolr * w), int(tolr * z))
    x = x.copy()
    total = 0
    while total < n_drop:
        r = rng.randint(0, h - tol[0])
        cc = rng.randint(0, w - tol[1])
        s = rng.randint(0, z - tol[2])
        r2 = min(rng.randint(tol[0] + 1, max(mx[0], tol[0] + 2)) + r, h)
        c2 = min(rng.randint(tol[1] + 1, max(mx[1], tol[1] + 2)) + cc, w)
        s2 = min(rng.randint(tol[2] + 1, max(mx[2], tol[2] + 2)) + s, z)
        if min(r2 - r, c2 - cc, s2 - s) <= 0:
            continue
        if x_rep is None:
            noise = rng.standard_normal((c, r2 - r, c2 - cc, s2 - s)).astype(
                x.dtype
            )
            noise = (noise - noise.min()) / (noise.max() - noise.min() + 1e-8)
            x[:, r:r2, cc:c2, s:s2] = noise
        else:
            x[:, r:r2, cc:c2, s:s2] = x_rep[:, r:r2, cc:c2, s:s2]
        total += (r2 - r) * (c2 - cc) * (s2 - s)
    return x


def rot_rand(
    x: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Random in-plane 90° rotations per sample with labels
    (`ops.py:46-64`); x is (B, C, D, H, W)."""
    rng = rng or np.random.RandomState()
    out = x.copy()
    labels = np.zeros(x.shape[0], np.int32)
    for i in range(x.shape[0]):
        k = rng.randint(0, 4)
        labels[i] = k
        if k:
            out[i] = np.rot90(x[i], k, axes=(2, 3))
    return out, labels


def aug_rand(
    x: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """Per-sample block drop + cross-sample block replace (`ops.py:67-75`)."""
    rng = rng or np.random.RandomState()
    out = x.copy()
    n = x.shape[0]
    for i in range(n):
        out[i] = patch_rand_drop(out[i], rng=rng)
        j = rng.randint(0, n)
        if j != i:
            out[i] = patch_rand_drop(out[i], out[j], rng=rng)
    return out


def augment_context_restoration(
    x: np.ndarray,
    num_swaps: int = 3,
    max_patch_fraction: float = 0.2,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Swap random same-volume patches (`ops.py:78-122`); x is (C, D, H, W)."""
    rng = rng or np.random.RandomState()
    x = x.copy()
    c, h, w, z = x.shape
    for _ in range(num_swaps):
        ph = rng.randint(1, max(int(h * max_patch_fraction), 2))
        pw = rng.randint(1, max(int(w * max_patch_fraction), 2))
        pd = rng.randint(1, max(int(z * max_patch_fraction), 2))
        r1, c1, s1 = (rng.randint(0, h - ph), rng.randint(0, w - pw),
                      rng.randint(0, z - pd))
        r2, c2, s2 = (rng.randint(0, h - ph), rng.randint(0, w - pw),
                      rng.randint(0, z - pd))
        p1 = x[:, r1:r1 + ph, c1:c1 + pw, s1:s1 + pd].copy()
        p2 = x[:, r2:r2 + ph, c2:c2 + pw, s2:s2 + pd].copy()
        x[:, r1:r1 + ph, c1:c1 + pw, s1:s1 + pd] = p2
        x[:, r2:r2 + ph, c2:c2 + pw, s2:s2 + pd] = p1
    return x


def make_two_views(
    batch_cdhw: np.ndarray, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray]:
    """Two context-restoration views per volume (`train.py` usage)."""
    v1 = np.stack([
        augment_context_restoration(s, rng=rng) for s in batch_cdhw
    ])
    v2 = np.stack([
        augment_context_restoration(s, rng=rng) for s in batch_cdhw
    ])
    return v1, v2


# --------------------------------------------------------------------------- #
# trainer
# --------------------------------------------------------------------------- #


class SSLTrainer:
    """Step-based SSL pretraining loop (`self_supervised/train.py:21-310`)."""

    def __init__(
        self,
        model,
        num_steps: int = 10000,
        batch_size: int = 2,
        lr: float = 4e-4,
        weight_decay: float = 1e-5,
        warmup_steps: int = 500,
        eval_every: int = 100,
        temperature: float = 0.5,
        logdir: str = "./logs_ssl",
        mesh=None,
        seed: int = 42,
    ):
        self.model = model
        self.num_steps = num_steps
        self.batch_size = batch_size
        self.eval_every = eval_every
        self.temperature = temperature
        self.logdir = logdir
        self.seed = seed
        self.mesh = mesh if mesh is not None else default_mesh_for_batch(batch_size)
        self.log = get_logger()
        self.schedule = warmup_cosine_schedule(lr, warmup_steps, num_steps)
        self.tx = make_optimizer(
            lr=self.schedule, weight_decay=weight_decay, grad_clip_norm=None
        )
        self.ckpt = CheckpointManager(os.path.join(logdir, "model"))
        self.best_val = np.inf

    def _make_step(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        def step(state, v1, v2, gt, rng):
            def loss_fn(params):
                c1, r1 = self.model.apply(
                    params, v1, deterministic=False, rngs={"dropout": rng}
                )
                c2, r2 = self.model.apply(
                    params, v2, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(rng, 1)},
                )
                total, parts = ssl_total_loss(
                    c1, c2, r1, r2, gt, gt, self.temperature
                )
                return total, parts

            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads), {"loss": loss, **parts}

        repl = NamedSharding(self.mesh, P())
        bsh = NamedSharding(self.mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, bsh, bsh, bsh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def train(
        self,
        batch_iterator: Iterable[np.ndarray],
        val_batches: Optional[Sequence[np.ndarray]] = None,
    ) -> float:
        """`batch_iterator` yields (B, D, H, W, C) volumes (channels-last)."""
        writer = SummaryWriter(self.logdir)
        rng_np = np.random.RandomState(self.seed)
        it = iter(batch_iterator)
        first = next(it)
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(self.seed), jnp.asarray(first)
        )
        state = replicate(self.mesh, TrainState.create(params, self.tx))
        step_fn = self._make_step()
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.log.info(f"SSL model: {n_params:,} params")

        def views(gt):
            cdhw = gt.transpose(0, 4, 1, 2, 3)
            v1, v2 = make_two_views(cdhw, rng_np)
            tocl = lambda a: a.transpose(0, 2, 3, 4, 1)
            return tocl(v1), tocl(v2)

        gt = first
        for step_i in range(self.num_steps):
            v1, v2 = views(gt)
            b = shard_batch(self.mesh, {
                "v1": np.ascontiguousarray(v1),
                "v2": np.ascontiguousarray(v2),
                "gt": np.asarray(gt),
            })
            state, metrics = step_fn(
                state, b["v1"], b["v2"], b["gt"],
                jax.random.fold_in(jax.random.PRNGKey(self.seed), step_i),
            )
            if step_i % 10 == 0:
                loss = float(metrics["loss"])
                writer.add_scalars(
                    {k: float(v) for k, v in metrics.items()}, step_i
                )
                self.log.info(
                    f"ssl step {step_i}: loss {loss:.4f} "
                    f"(contrast {float(metrics['contrast']):.4f}, "
                    f"recon {float(metrics['recon']):.4f})"
                )
            if val_batches and (step_i + 1) % self.eval_every == 0:
                val = self._validate(state, val_batches)
                writer.add_scalar("val_recon_l1", val, step_i)
                if val < self.best_val:
                    self.best_val = val
                    self.ckpt.save_best(
                        jax.device_get(state.params), -val, step_i, "ssl_vit"
                    )
            try:
                gt = next(it)
            except StopIteration:
                break
        self.ckpt.save_final(jax.device_get(state.params), 0.0, self.num_steps,
                             "ssl_vit")
        writer.close()
        self.state = state
        return self.best_val

    def _validate(self, state, val_batches) -> float:
        losses = []
        for gt in val_batches:
            _, rec = self.model.apply(state.params, jnp.asarray(gt))
            losses.append(float(jnp.mean(jnp.abs(rec - jnp.asarray(gt)))))
        return float(np.mean(losses))
