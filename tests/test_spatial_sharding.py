"""Spatial (sequence) axis proof at realistic scale.

The `spatial` mesh axis shards the D (depth) dim of a volume across devices
(`parallel/mesh.py::batch_spec`) — the TPU-native long-context mechanism the
reference lacks (SURVEY.md §5). These tests assert that a spatially-sharded
forward equals the single-device forward to fp tolerance, i.e. XLA/GSPMD
inserts correct halo exchanges through every structure that mixes
information across D: 3³ convs, DWT strided slices, window partition,
patch merging, trilinear upsampling and IDWT.

The slow test runs the FULL flagship config (128³ input, dims 48/96/192/384,
depths 2/2/2/2, decom levels 3/2/1/0 ⇒ window size 8 at every stage) — the
shape class VERDICT r2 required; the 32³/8-dim toy could not catch a halo
bug at real window geometry. (Window size is architecturally fixed at
img/2^(decom_levels[0]+1), so ws=8 exists only at 128³ — the decoder's IDWT
ladder requires the (L, L-1, ..., 0) decomposition pattern.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from waveformer_tpu.models import Waveformer
from waveformer_tpu.parallel.mesh import MeshSpec, batch_spec, make_mesh


def _forward_sharded_vs_serial(model, x, mesh):
    params = model.init(jax.random.PRNGKey(0), x)

    serial = jax.jit(model.apply)(params, x)

    in_shard = NamedSharding(mesh, batch_spec(mesh))
    xs = jax.device_put(x, in_shard)
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    sharded = jax.jit(
        model.apply, out_shardings=NamedSharding(mesh, P())
    )(ps, xs)
    return np.asarray(serial, np.float32), np.asarray(sharded, np.float32)


@pytest.mark.slow
def test_spatial_sharded_forward_flagship():
    """data=1 x spatial=2: D-sharded flagship 128^3 forward == serial."""
    mesh = make_mesh(MeshSpec(data=1, spatial=2), jax.devices()[:2])
    model = Waveformer(
        img_size=(128, 128, 128),
        patch_size=2,
        in_chans=4,
        out_chans=4,
        embed_dims=(48, 96, 192, 384),
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        decom_levels=(3, 2, 1, 0),  # flagship: ws=8 at every stage
        drop_path_rate=0.0,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 128, 128, 4)),
        jnp.float32,
    )
    serial, sharded = _forward_sharded_vs_serial(model, x, mesh)
    np.testing.assert_allclose(sharded, serial, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_spatial_sharded_forward_small():
    """Quick-suite guard: data=2 x spatial=2 on a reduced model."""
    mesh = make_mesh(MeshSpec(data=2, spatial=2), jax.devices()[:4])
    model = Waveformer(
        img_size=(32, 32, 32),
        patch_size=2,
        in_chans=2,
        out_chans=3,
        embed_dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1),
        num_heads=(2, 4, 8, 8),
        decom_levels=(3, 2, 1, 0),
        drop_path_rate=0.0,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 32, 2)),
        jnp.float32,
    )
    serial, sharded = _forward_sharded_vs_serial(model, x, mesh)
    np.testing.assert_allclose(sharded, serial, atol=2e-4, rtol=1e-3)
