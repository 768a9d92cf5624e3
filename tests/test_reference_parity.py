"""Golden parity: ported torch reference weights must reproduce logits.

Builds the *actual* reference model from /root/reference (torch, CPU) with a
faithful Haar stand-in for the missing `ptwt` package, converts its
state_dict via `waveformer_tpu.utils.torch_port`, and checks per-voxel logit
agreement of the flax model. This is the checkpoint-port parity gate from
SURVEY.md §7 step 3.

Skipped automatically when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _install_reference_stubs():
    """Stub ptwt (with a real Haar implementation), timm, ptflops, torchinfo."""
    import torch
    import torch.nn as nn

    if "ptwt" in sys.modules and hasattr(sys.modules["ptwt"], "_is_test_shim"):
        return

    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    def _split(x, dim):
        n = x.shape[dim]
        if n % 2 == 1:
            pad = [0, 0] * (x.ndim - dim - 1) + [0, 1]
            x = torch.nn.functional.pad(x, pad)
        x0 = x.narrow(dim, 0, x.shape[dim]).index_select(
            dim, torch.arange(0, x.shape[dim], 2)
        )
        x1 = x.index_select(dim, torch.arange(1, x.shape[dim], 2))
        return (x0 + x1) * inv_sqrt2, (x0 - x1) * inv_sqrt2

    def _merge(a, d, dim):
        x0 = (a + d) * inv_sqrt2
        x1 = (a - d) * inv_sqrt2
        stacked = torch.stack([x0, x1], dim=dim + 1)
        shape = list(a.shape)
        shape[dim] = a.shape[dim] * 2
        return stacked.reshape(shape)

    def _dwt_once(x):
        a, d = _split(x, 2)
        aa, ad = _split(a, 3)
        da, dd = _split(d, 3)
        aaa, aad = _split(aa, 4)
        ada, add = _split(ad, 4)
        daa, dad = _split(da, 4)
        dda, ddd = _split(dd, 4)
        return aaa, {
            "aad": aad, "ada": ada, "add": add,
            "daa": daa, "dad": dad, "dda": dda, "ddd": ddd,
        }

    def wavedec3(x, wavelet="db1", level=1, mode="zero"):
        assert str(getattr(wavelet, "name", wavelet)) in ("db1", "haar")
        dets = []
        ll = x
        for _ in range(level):
            ll, det = _dwt_once(ll)
            dets.append(det)
        return [ll] + list(reversed(dets))

    def waverec3(coeffs, wavelet="db1"):
        x = coeffs[0]
        for det in coeffs[1:]:
            aa = _merge(x, det["aad"], 4)
            ad = _merge(det["ada"], det["add"], 4)
            da = _merge(det["daa"], det["dad"], 4)
            dd = _merge(det["dda"], det["ddd"], 4)
            a = _merge(aa, ad, 3)
            d = _merge(da, dd, 3)
            x = _merge(a, d, 2)
        return x

    ptwt = types.ModuleType("ptwt")
    ptwt.wavedec3 = wavedec3
    ptwt.waverec3 = waverec3
    ptwt._is_test_shim = True
    sys.modules["ptwt"] = ptwt

    for name in ("ptflops", "torchinfo"):
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    sys.modules["ptflops"].get_model_complexity_info = lambda *a, **k: (0, 0)
    sys.modules["torchinfo"].summary = lambda *a, **k: None

    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a, b)
        return t

    tl.DropPath = DropPath
    tl.to_2tuple = lambda v: (v, v)
    tl.trunc_normal_ = trunc_normal_
    timm.models = tm
    tm.layers = tl
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = tm
    sys.modules["timm.models.layers"] = tl

    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def reference_pair():
    """(torch reference model, matching flax model, config kwargs)."""
    _install_reference_stubs()
    import torch

    from network_models.network_backbone import Waveformer as TorchWaveformer
    from waveformer_tpu.models import Waveformer as JaxWaveformer

    torch.manual_seed(0)
    tmodel = TorchWaveformer(
        img_size=(32, 32, 32),
        patch_size=2,
        in_chans=2,
        out_chans=3,
        depths=[1, 1, 1, 1],
        feat_size=[8, 16, 32, 64],
        num_heads=[2, 4, 8, 8],
        drop_path_rate=0.0,
    ).eval()

    jmodel = JaxWaveformer(
        img_size=(32, 32, 32),
        patch_size=2,
        in_chans=2,
        out_chans=3,
        depths=(1, 1, 1, 1),
        embed_dims=(8, 16, 32, 64),
        num_heads=(2, 4, 8, 8),
        decom_levels=(3, 2, 1, 0),
        drop_path_rate=0.0,
    )
    return tmodel, jmodel


class TestCheckpointPort:
    def test_state_dict_fully_converts(self, reference_pair):
        from waveformer_tpu.utils.torch_port import convert_state_dict

        tmodel, jmodel = reference_pair
        params = convert_state_dict(
            tmodel.state_dict(), depths=(1, 1, 1, 1), strict=True
        )
        # shapes must match the flax init tree exactly
        ref_shapes = jax.eval_shape(
            lambda: jmodel.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 2))
            )
        )
        import flax

        got = flax.traverse_util.flatten_dict(params)
        want = flax.traverse_util.flatten_dict(
            jax.tree.map(lambda a: a.shape, ref_shapes)
        )
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )
        for k in want:
            assert got[k].shape == tuple(want[k]), (k, got[k].shape, want[k])

    def test_logits_parity(self, reference_pair, rng):
        """The minimal-slice exit gate: per-patch logits match torch."""
        import torch

        from waveformer_tpu.utils.torch_port import convert_state_dict

        tmodel, jmodel = reference_pair
        params = convert_state_dict(
            tmodel.state_dict(), depths=(1, 1, 1, 1), strict=True
        )
        x = rng.standard_normal((1, 2, 32, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()  # (1, 3, 32, 32, 32)
        got = jmodel.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        got = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestPthFileRoundTrip:
    """File-based checkpoint port: the untested seam a real
    `best_model.pth` hits first — torch pickle IO, tensor dtypes,
    `module.` prefix strip, optimizer entries riding along."""

    def _reference_style_pth(self, src_model, path, nest_module_key=False):
        """Write a .pth exactly as the reference does
        (`light_training/utils/files_helper.py:13-32`): DDP-prefixed model
        state dict + optimizer state + epoch + dice_score. Works on a
        deepcopy so the shared fixture model is never mutated; returns the
        stepped copy (the weights the file actually contains)."""
        import copy

        import torch

        tmodel = copy.deepcopy(src_model)
        sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
        if nest_module_key:
            sd = {"module": sd}
        opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-4)
        # one real step so the optimizer state has exp_avg/exp_avg_sq tensors
        loss = sum(p.float().sum() for p in tmodel.parameters())
        loss.backward()
        opt.step()
        torch.save(
            {
                "model": sd,
                "optimizer": opt.state_dict(),
                "epoch": 7,
                "dice_score": 0.9137,
            },
            str(path),
        )
        return tmodel.eval()

    def test_pth_file_logits_parity(self, reference_pair, rng, tmp_path):
        """torch.save → load_torch_checkpoint → flax logits == torch logits
        (the optimizer step perturbs the copy's weights before saving, so
        the parity below proves the FILE's weights round-tripped, not the
        fixture's)."""
        import torch

        from waveformer_tpu.utils.torch_port import load_torch_checkpoint

        tmodel, jmodel = reference_pair
        p = tmp_path / "best_model_0.9137.pth"
        stepped = self._reference_style_pth(tmodel, p)
        params = load_torch_checkpoint(str(p), depths=(1, 1, 1, 1), strict=True)

        x = rng.standard_normal((1, 2, 32, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = stepped(torch.from_numpy(x)).numpy()
            fixture_logits = tmodel(torch.from_numpy(x)).numpy()
        assert not np.allclose(want, fixture_logits), (
            "optimizer step should have changed the saved weights"
        )
        got = jmodel.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        got = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_pth_nested_module_key(self, reference_pair, tmp_path):
        """The `state_dict['module']` layout `_filter_state_dict` handles
        (`4_predict.py:287-306`) converts too."""
        from waveformer_tpu.utils.torch_port import load_torch_checkpoint

        tmodel, _ = reference_pair
        p = tmp_path / "final_model_0.5.pth"
        self._reference_style_pth(tmodel, p, nest_module_key=True)
        params = load_torch_checkpoint(str(p), depths=(1, 1, 1, 1), strict=True)
        assert "params" in params

    def test_pth_bare_state_dict(self, reference_pair, tmp_path):
        import torch

        from waveformer_tpu.utils.torch_port import load_torch_checkpoint

        tmodel, _ = reference_pair
        p = tmp_path / "bare.pth"
        torch.save(tmodel.state_dict(), str(p))
        params = load_torch_checkpoint(str(p), depths=(1, 1, 1, 1), strict=True)
        assert "params" in params


class TestHFRefinementPort:
    def test_hf_refinement_logits_parity(self, rng):
        """Converter + model parity for the hf_refinement=True variant
        (per-level gated HF filtering, off by default in the reference)."""
        _install_reference_stubs()
        import torch

        from network_models.network_backbone import Waveformer as TorchWaveformer
        from waveformer_tpu.models import Waveformer as JaxWaveformer
        from waveformer_tpu.utils.torch_port import convert_state_dict

        torch.manual_seed(1)
        tmodel = TorchWaveformer(
            img_size=(32, 32, 32), patch_size=2, in_chans=2, out_chans=3,
            depths=[1, 1, 1, 1], feat_size=[8, 16, 32, 64],
            num_heads=[2, 4, 8, 8], drop_path_rate=0.0,
            network_config={"transformer": {"hf_refinement": True}},
        ).eval()
        jmodel = JaxWaveformer(
            img_size=(32, 32, 32), patch_size=2, in_chans=2, out_chans=3,
            depths=(1, 1, 1, 1), embed_dims=(8, 16, 32, 64),
            num_heads=(2, 4, 8, 8), decom_levels=(3, 2, 1, 0),
            drop_path_rate=0.0, hf_refinement=True,
        )
        params = convert_state_dict(
            tmodel.state_dict(), depths=(1, 1, 1, 1), hf_refinement=True,
            strict=True,
        )
        x = rng.standard_normal((1, 2, 32, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()
        got = jmodel.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        got = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestProjectionHeadPort:
    def test_projection_head_parity(self, rng):
        """Contrastive ProjectionHead (`network_backbone.py:35-63`) parity,
        incl. BatchNorm running stats through the converter."""
        _install_reference_stubs()
        import torch

        from network_models.network_backbone import (
            ProjectionHead as TorchProjectionHead,
        )
        from waveformer_tpu.models import ProjectionHead
        from waveformer_tpu.utils.torch_port import convert_projection_head

        torch.manual_seed(2)
        tmodel = TorchProjectionHead(dim_in=16, proj_dim=8)
        # push a batch through in train mode so running stats are nontrivial
        with torch.no_grad():
            tmodel.train()
            tmodel(torch.randn(2, 16, 4, 4, 4))
            tmodel.eval()
        variables = convert_projection_head(tmodel.state_dict())
        jmodel = ProjectionHead(dim_in=16, proj_dim=8)
        x = rng.standard_normal((2, 16, 4, 4, 4)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()
        got = jmodel.apply(
            jax.tree.map(jnp.asarray, variables),
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        got = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
class TestFlagshipConfigParity:
    def test_flagship_network_logits_parity(self, rng):
        """Checkpoint-port parity at the flagship network scale
        (`config.yaml:43-77`): dims 48-384, heads 3/6/12/24, depths
        2/2/2/2, window size 8 (15^3 rel-pos bias table) and nW>1
        window-merge scramble at every stage — the regimes the toy
        32^3 test does not reach. This is the full 128^3 flagship
        network; ~10 min on one CPU core, hence the slow mark.
        (decom_levels must stay (3,2,1,0): the reference decoder
        structurally requires 3/2/1 HF levels from stages 1-3,
        `network_backbone.py:296-330`.)"""
        _install_reference_stubs()
        import torch

        from network_models.network_backbone import Waveformer as TorchWaveformer
        from waveformer_tpu.models import Waveformer as JaxWaveformer
        from waveformer_tpu.utils.torch_port import convert_state_dict

        torch.manual_seed(3)
        tmodel = TorchWaveformer(
            img_size=(128, 128, 128), patch_size=2, in_chans=4, out_chans=4,
            depths=[2, 2, 2, 2], feat_size=[48, 96, 192, 384],
            num_heads=[3, 6, 12, 24], drop_path_rate=0.0,
        ).eval()
        jmodel = JaxWaveformer(
            img_size=(128, 128, 128), patch_size=2, in_chans=4, out_chans=4,
            depths=(2, 2, 2, 2), embed_dims=(48, 96, 192, 384),
            num_heads=(3, 6, 12, 24), decom_levels=(3, 2, 1, 0),
            drop_path_rate=0.0,
        )
        # ws = stage_grid / 2^level = 8 at every stage: the flagship
        # (15,15,15) bias table and multi-window scramble
        tbl = tmodel.state_dict()[
            "waveformer_encoder.block1.0.attn.relative_position_bias_table"
        ]
        assert tbl.shape[0] == 15**3
        params = convert_state_dict(
            tmodel.state_dict(), depths=(2, 2, 2, 2), strict=True
        )
        x = rng.standard_normal((1, 4, 128, 128, 128)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()
        got = jmodel.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        got = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
