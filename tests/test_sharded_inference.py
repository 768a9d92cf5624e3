"""Case-sharded multi-chip inference == serial inference, case for case.

Runs on the virtual 8-device CPU mesh (conftest). This is the test the
reference cannot express (its eval sharding is rank-sliced dataloaders,
`light_training/sampler.py:5-48`); here sharded full-volume TTA inference
over the mesh `data` axis must reproduce the serial per-case path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.inference import Predictor, SlidingWindowInferer
from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh


def _make_predictor_fn(cf: bool):
    """Deterministic nonlinear patch predictor (stands in for the model)."""
    kernel = jax.random.normal(jax.random.PRNGKey(3), (4, 2), jnp.float32)

    def fn(patches):
        if cf:  # (B, C, *roi) -> (B, out, *roi)
            h = jnp.einsum("bcdhw,co->bodhw", patches.astype(jnp.float32), kernel)
        else:  # (B, *roi, C) -> (B, *roi, out)
            h = jnp.einsum("bdhwc,co->bdhwo", patches.astype(jnp.float32), kernel)
        return jnp.tanh(h) + 0.1 * h
    return fn


@pytest.mark.parametrize("layout", ["channels_first", "channels_last"])
def test_sharded_matches_serial(layout):
    cf = layout == "channels_first"
    rng = np.random.default_rng(0)
    inferer = SlidingWindowInferer(
        roi_size=(16, 16, 16), sw_batch_size=2, overlap=0.5,
        mirror_axes=(0, 1, 2), layout=layout,
    )
    pred = Predictor(inferer)
    fn = _make_predictor_fn(cf)

    # 5 cases, two distinct shapes (two compile buckets), not divisible by 8
    shapes = [(20, 18, 16), (20, 18, 16), (16, 16, 16), (24, 20, 18),
              (20, 18, 16)]
    vols = []
    for s in shapes:
        v = rng.standard_normal((4, *s) if cf else (*s, 4)).astype(np.float32)
        vols.append(v)

    # properties: case 3 needs a logit resample (serial fallback); others
    # carry crop/embed geometry only
    props = []
    for i, s in enumerate(shapes):
        # case 3 exercises the serial resample fallback: its pre-resample
        # crop shape (== bbox extent) differs from the volume shape
        crop = tuple(d + 2 for d in s) if i == 3 else s
        p = {
            "shape_before_cropping": tuple(d + 4 for d in crop),
            "bbox_used_for_cropping": [[2, 2 + d] for d in crop],
            "shape_after_cropping_before_resample": crop,
        }
        props.append(p)

    serial = [
        pred.predict_case(v, fn, out_channels=2, properties=p)
        for v, p in zip(vols, props)
    ]

    mesh = make_mesh(MeshSpec(data=8))
    sharded = dict(
        pred.predict_cases_sharded(
            vols, fn, out_channels=2, properties_list=props, mesh=mesh
        )
    )
    assert sorted(sharded) == list(range(len(vols)))
    for i, ref in enumerate(serial):
        np.testing.assert_array_equal(
            sharded[i], ref, err_msg=f"case {i} ({layout})"
        )


def test_sharded_no_properties():
    inferer = SlidingWindowInferer(
        roi_size=(16,) * 3, sw_batch_size=4, overlap=0.25,
        layout="channels_first",
    )
    pred = Predictor(inferer)
    fn = _make_predictor_fn(True)
    rng = np.random.default_rng(1)
    vols = [rng.standard_normal((4, 18, 16, 20)).astype(np.float32)
            for _ in range(3)]
    serial = [pred.predict_case(v, fn, out_channels=2) for v in vols]
    mesh = make_mesh(MeshSpec(data=4), jax.devices()[:4])
    out = dict(pred.predict_cases_sharded(vols, fn, 2, mesh=mesh))
    for i, ref in enumerate(serial):
        np.testing.assert_array_equal(out[i], ref)
