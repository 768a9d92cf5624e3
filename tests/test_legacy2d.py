"""2D leftover modules (reference wave_helper.py:86-110,302-341,571-640,690-709).

Dead code in the reference's 3D path, ported for surface parity. DWConv2D and
PosCNN2D are checked numerically against inline torch constructions of the
reference's layer stacks; the rest are shape/semantics tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from waveformer_tpu.models.legacy2d import (
    DWConv2D,
    Mlp2D,
    OverlapPatchEmbed2D,
    PosCNN2D,
)


def test_mlp2d_shapes_and_hidden():
    x = jnp.ones((2, 12, 16))
    mod = Mlp2D(hidden_features=32, out_features=8)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (2, 12, 8)
    assert params["params"]["fc1"]["kernel"].shape == (16, 32)
    # defaults: hidden = out = in_features
    mod2 = Mlp2D()
    p2 = mod2.init(jax.random.PRNGKey(0), x)
    assert mod2.apply(p2, x).shape == x.shape


def test_dwconv2d_matches_torch():
    b, h, w, c = 2, 6, 5, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, h * w, c)).astype(np.float32)
    mod = DWConv2D()
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), h, w)
    y = mod.apply(params, jnp.asarray(x), h, w)
    assert y.shape == (b, h * w, c)

    # torch depthwise conv on the (B, C, H, W) grid, same weights
    tconv = torch.nn.Conv2d(c, c, 3, 1, 1, groups=c, bias=True)
    k = np.asarray(params["params"]["dwconv"]["kernel"])  # (3,3,1,C)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["dwconv"]["bias"])))
    xt = torch.from_numpy(x).permute(0, 2, 1).reshape(b, c, h, w)
    yt = tconv(xt).flatten(2).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_overlap_patch_embed_grid_and_norm():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 28, 28, 3)), jnp.float32)
    mod = OverlapPatchEmbed2D(embed_dim=24, patch_size=7, stride=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    tokens, h, w = mod.apply(params, x)
    assert (h, w) == (7, 7)  # (28 + 2*3 - 7)//4 + 1
    assert tokens.shape == (2, 49, 24)
    # LayerNorm applied over channels
    np.testing.assert_allclose(
        np.asarray(tokens).mean(-1), 0.0, atol=1e-4
    )


def test_poscnn2d_matches_torch_and_residual():
    b, h, w, c = 2, 5, 4, 8
    rng = np.random.default_rng(2)
    x = rng.normal(size=(b, h * w, c)).astype(np.float32)
    mod = PosCNN2D(embed_dim=c, stride=1)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(x), h, w)
    y = mod.apply(params, jnp.asarray(x), h, w)
    assert y.shape == (b, h * w, c)

    p = params["params"]
    dw = torch.nn.Conv2d(c, c, 3, 1, 1, groups=c)
    pw = torch.nn.Conv2d(c, c, 1, 1, 0)
    with torch.no_grad():
        dw.weight.copy_(
            torch.from_numpy(np.asarray(p["proj_dw"]["kernel"]).transpose(3, 2, 0, 1))
        )
        dw.bias.copy_(torch.from_numpy(np.asarray(p["proj_dw"]["bias"])))
        pw.weight.copy_(
            torch.from_numpy(np.asarray(p["proj_pw"]["kernel"]).transpose(3, 2, 0, 1))
        )
        pw.bias.copy_(torch.from_numpy(np.asarray(p["proj_pw"]["bias"])))
    xt = torch.from_numpy(x).transpose(1, 2).reshape(b, c, h, w)
    yt = pw(torch.nn.functional.gelu(dw(xt))) + xt  # s=1 -> residual
    yt = yt.flatten(2).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-3)

    with pytest.raises(ValueError):
        PosCNN2D(embed_dim=c + 1).init(jax.random.PRNGKey(0), jnp.asarray(x), h, w)


def test_rgb_normalization_scheme():
    from waveformer_tpu.data.preprocessing import RGBTo01Normalization

    img = np.array([[0, 128, 255]], dtype=np.uint8)
    out = RGBTo01Normalization().run(img, None)
    np.testing.assert_allclose(out, [[0.0, 128 / 255.0, 1.0]])
    assert out.dtype == np.float32
    with pytest.raises(ValueError):
        RGBTo01Normalization().run(np.array([-1.0, 2.0]), None)
    with pytest.raises(ValueError):
        RGBTo01Normalization().run(np.array([0.0, 256.0]), None)
