"""Parity of the A/B perf-flag conv paths against the default fast path.

The env flags select alternative formulations of the SAME math inside
`_Conv3dCore` / `_scan_over_batch`; fp32 CPU forwards must agree to
reassociation noise. (A TPU fp32 cross-check is NOT rigorous — XLA TPU
convs run bf16 MXU passes at DEFAULT precision even for fp32 inputs, so
regrouped GEMMs truncate differently.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.models import Waveformer

KW = dict(
    img_size=(32, 32, 32), patch_size=2, in_chans=2, out_chans=3,
    embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
    num_heads=(2, 4, 8, 8), decom_levels=(3, 2, 1, 0),
    drop_path_rate=0.0, dtype=jnp.float32,
)

FLAGS = ("WFTPU_KDG_CONV", "WFTPU_UNROLL_BATCH", "WFTPU_PAIRED_CONV")


def _fwd(model, params, x, **flags):
    old = {k: os.environ.get(k) for k in FLAGS}
    try:
        for k in FLAGS:
            os.environ[k] = flags.get(k, "0")
        return np.asarray(jax.jit(lambda v: model.apply(params, v))(x))
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})


@pytest.fixture(scope="module")
def base_setup():
    model = Waveformer(**KW)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 32, 32, 32, 2)),
        jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    return model, params, x, _fwd(model, params, x)


@pytest.mark.parametrize("flag", FLAGS)
def test_conv_flag_parity_fp32(base_setup, flag):
    model, params, x, base = base_setup
    alt = _fwd(model, params, x, **{flag: "1"})
    np.testing.assert_allclose(alt, base, atol=1e-4, rtol=1e-4)
