"""Fused window-attention kernel == XLA composition (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.ops.attention_pallas import (
    _reference,
    supported,
    window_attention,
)


@pytest.mark.parametrize(
    "bw,h,n,d",
    [(4, 3, 512, 16), (2, 24, 512, 16), (3, 2, 128, 8)],
)
def test_kernel_matches_reference(bw, h, n, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    b = jnp.asarray(rng.randn(h, n, n) * 0.5, jnp.float32)
    ref = _reference(q, k, v, b, d**-0.5)
    out = window_attention(q, k, v, b, d**-0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_flow_through_reference_vjp():
    rng = np.random.RandomState(1)
    bw, h, n, d = 2, 2, 128, 8
    q = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bw, h, n, d), jnp.float32)
    b = jnp.asarray(rng.randn(h, n, n) * 0.5, jnp.float32)

    def loss_kernel(q, k, v, b):
        return jnp.sum(window_attention(q, k, v, b, d**-0.5, True) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(_reference(q, k, v, b, d**-0.5) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, b)
    for a, bgrad in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bgrad), atol=1e-3)


def test_supported_predicate():
    assert supported(512, 16)       # every WaveFormer stage (ws=8, hd=16)
    assert not supported(500, 16)   # ragged N
    assert not supported(2048, 16)  # scores would not fit VMEM budget
    assert not supported(512, 12)   # unaligned head_dim
