"""Pallas depthwise 3³ stencil (`ops/dwconv_pallas.py`) vs XLA grouped conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.ops.dwconv_pallas import _reference, dwconv3, supported


@pytest.mark.parametrize("shape", [(2, 4, 6, 5, 128), (1, 3, 8, 8, 256)])
def test_matches_grouped_conv(shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c)), jnp.float32)
    out = dwconv3(x, k, True)  # interpret mode (CPU)
    ref = _reference(x, k)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_backward_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 128)), jnp.float32)
    g = jax.grad(lambda a, w: jnp.sum(dwconv3(a, w, True) ** 2), (0, 1))
    gr = jax.grad(lambda a, w: jnp.sum(_reference(a, w) ** 2), (0, 1))
    for ours, ref in zip(g(x, k), gr(x, k)):
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_supported_gate():
    # Mosaic's 16 MiB *scoped* (stack) VMEM limit binds, not total VMEM:
    # the 64³ c=192 stage-0 FFN shape allocates 17.92 MiB on the stack and
    # compile-OOMs (measured, BENCH_NOTES.md) — the gate must reject it.
    assert not supported(64, 64, 64, 192)  # stage-0 hidden: measured OOM
    assert supported(32, 32, 32, 384)      # CCF_FFN stage-1 hidden
    assert supported(16, 16, 16, 768)      # CCF_FFN stage-2 hidden
    assert not supported(64, 64, 64, 20)   # tiny C: not worth a kernel
    assert not supported(128, 128, 128, 1536)  # VMEM blowout


def test_ragged_lane_channels():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 3, 5, 6, 192)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 192)), jnp.float32)
    np.testing.assert_allclose(dwconv3(x, k, True), _reference(x, k), atol=1e-4)


def test_conv3d_depthwise_gate(monkeypatch):
    """Conv3d(groups=C) routes through the kernel only when enabled AND on
    TPU — on CPU it must stay on the grouped-conv path and stay correct."""
    from waveformer_tpu.models.common import Conv3d

    monkeypatch.setenv("WFTPU_PALLAS_DWCONV", "1")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 128)), jnp.float32)
    mod = Conv3d(128, kernel_size=3, groups=128)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    k = params["params"]["conv"]["kernel"][:, :, :, 0, :]
    b = params["params"]["conv"]["bias"]
    ref = _reference(x, k) + b
    np.testing.assert_allclose(out, ref, atol=1e-4)
