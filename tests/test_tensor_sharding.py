"""Tensor-parallel param sharding: sharded forward == replicated forward.

Gives the mesh `tensor` axis a real consumer (VERDICT r2 #9): attention
qkv/proj and CCF-FFN weights are placed column/row-parallel over `tensor`
and the jitted forward must be numerically identical — GSPMD inserts the
collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from waveformer_tpu.models import Waveformer
from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh
from waveformer_tpu.parallel.tensor_sharding import (
    shard_params_tensor,
    tensor_param_specs,
)


def _toy_model():
    return Waveformer(
        img_size=(32, 32, 32), patch_size=2, in_chans=2, out_chans=3,
        depths=(1, 1, 1, 1), embed_dims=(16, 32, 64, 128),
        num_heads=(2, 4, 8, 8), decom_levels=(3, 2, 1, 0),
        drop_path_rate=0.0, dtype=jnp.float32,
    )


def test_specs_cover_attention_and_ffn():
    model = _toy_model()
    x = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    specs = tensor_param_specs(params)
    leaves = jax.tree_util.tree_leaves_with_path(specs)
    sharded_paths = [
        "/".join(getattr(p, "key", str(p)) for p in path)
        for path, spec in leaves
        if spec != P()
    ]
    assert any("qkv" in p for p in sharded_paths)
    assert any("proj" in p and "attn" in p for p in sharded_paths)
    assert any("pwconv" in p for p in sharded_paths)
    assert any("fc" in p for p in sharded_paths)
    # conv/decoder params replicate
    assert not any("decoder" in p for p in sharded_paths)


@pytest.mark.slow
def test_tensor_sharded_forward_matches():
    mesh = make_mesh(MeshSpec(data=2, tensor=2), jax.devices()[:4])
    model = _toy_model()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 32, 2)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), x)

    ref = jax.jit(model.apply)(params, x)

    ps = shard_params_tensor(mesh, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        model.apply, out_shardings=NamedSharding(mesh, P())
    )(ps, xs)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-4, rtol=1e-3,
    )
