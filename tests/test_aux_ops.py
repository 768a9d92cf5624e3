"""Auxiliary native-op equivalents: bilateral, GMM, grid pull/push."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformer_tpu.ops.bilateral import (
    TrainableBilateralFilter,
    bilateral_filter,
    joint_bilateral_filter,
)
from waveformer_tpu.ops.gmm import gmm_fit, gmm_posterior, gmm_segment
from waveformer_tpu.ops.spatial import grid_count, grid_pull, grid_push


class TestBilateral:
    def test_constant_image_unchanged(self):
        x = jnp.full((1, 8, 8, 8, 1), 3.0)
        y = bilateral_filter(x, 1.0, 0.5)
        np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-5)

    def test_edge_preserving_vs_gaussian(self, rng):
        # step edge: bilateral smooths within regions but keeps the step
        x = np.zeros((1, 8, 16, 8, 1), np.float32)
        x[:, :, 8:] = 10.0
        x += rng.standard_normal(x.shape).astype(np.float32) * 0.1
        y = np.asarray(bilateral_filter(jnp.asarray(x), 1.5, 0.5))
        # step magnitude preserved
        assert (y[:, :, 9:].mean() - y[:, :, :7].mean()) > 9.0
        # noise reduced within a region
        assert y[:, :, :7].std() < x[:, :, :7].std()

    def test_trainable_grads(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 1)), jnp.float32)
        f = TrainableBilateralFilter(1.0, 0.5)

        def loss(params):
            return jnp.sum(f(params, x) ** 2)

        g = jax.grad(loss)(f.params)
        assert np.isfinite(float(g["spatial_sigma"]))
        assert abs(float(g["color_sigma"])) > 0

    def test_joint_guide(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 2)), jnp.float32)
        g = jnp.ones((1, 6, 6, 6, 1))
        y = joint_bilateral_filter(x, g, 1.0, 0.5)
        assert y.shape == x.shape


class TestGMM:
    def test_fit_recovers_two_clusters(self, rng):
        a = rng.standard_normal((500, 2)).astype(np.float32) * 0.3
        b = rng.standard_normal((500, 2)).astype(np.float32) * 0.3 + 5.0
        x = jnp.asarray(np.concatenate([a, b]))
        params = gmm_fit(x, 2, n_iters=30)
        means = np.sort(np.asarray(params.means)[:, 0])
        np.testing.assert_allclose(means, [0.0, 5.0], atol=0.3)
        post = gmm_posterior(params, x)
        labels = np.asarray(jnp.argmax(post, axis=1))
        # cluster purity
        assert (labels[:500] == labels[0]).mean() > 0.95
        assert (labels[500:] == labels[500]).mean() > 0.95

    def test_segment_shapes(self, rng):
        vol = jnp.asarray(rng.standard_normal((8, 8, 8, 2)), jnp.float32)
        seeds = -jnp.ones((8, 8, 8), jnp.int32)
        seeds = seeds.at[:4].set(0).at[4:].set(1)
        out = gmm_segment(vol, seeds, n_classes=2, n_iters=5)
        assert out.shape == (8, 8, 8)
        assert set(np.unique(np.asarray(out))) <= {0, 1}


class TestGridPullPush:
    def test_pull_at_integer_coords_is_lookup(self, rng):
        vol = jnp.asarray(rng.standard_normal((4, 5, 6, 2)), jnp.float32)
        coords = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        out = grid_pull(vol, coords)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vol[1, 2, 3]),
                                   atol=1e-6)

    def test_pull_midpoint_average(self):
        vol = jnp.zeros((2, 1, 1, 1)).at[1, 0, 0, 0].set(4.0)
        out = grid_pull(vol, jnp.asarray([[0.5, 0.0, 0.0]]))
        np.testing.assert_allclose(float(out[0, 0]), 2.0, atol=1e-6)

    def test_push_is_adjoint_of_pull(self, rng):
        """<pull(v), u> == <v, push(u)> — the defining adjoint identity."""
        vol = jnp.asarray(rng.standard_normal((4, 4, 4, 1)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, 3, (10, 3)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((10, 1)), jnp.float32)
        lhs = float(jnp.sum(grid_pull(vol, coords) * u))
        rhs = float(jnp.sum(vol * grid_push(u, coords, (4, 4, 4))))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_custom_vjp_matches_adjoint(self, rng):
        vol = jnp.asarray(rng.standard_normal((4, 4, 4, 1)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0.2, 2.8, (6, 3)), jnp.float32)

        def loss(v):
            return jnp.sum(grid_pull(v, coords) ** 2)

        g = jax.grad(loss)(vol)
        want = grid_push(2 * grid_pull(vol, coords), coords, (4, 4, 4))
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)

    def test_coords_grad_finite(self, rng):
        vol = jnp.asarray(rng.standard_normal((4, 4, 4, 1)), jnp.float32)
        coords = jnp.asarray([[1.3, 1.7, 2.1]], jnp.float32)
        g = jax.grad(lambda c: jnp.sum(grid_pull(vol, c)))(coords)
        assert np.isfinite(np.asarray(g)).all()

    @pytest.mark.parametrize("bound", ["zero", "clamp", "reflect"])
    def test_bound_modes(self, bound, rng):
        vol = jnp.asarray(rng.standard_normal((4, 4, 4, 1)), jnp.float32)
        coords = jnp.asarray([[-0.6, 1.0, 1.0], [3.6, 1.0, 1.0]], jnp.float32)
        out = grid_pull(vol, coords, bound)
        assert np.isfinite(np.asarray(out)).all()
        if bound == "zero":
            # fully outside → partial weights shrink magnitude
            far = grid_pull(vol, jnp.asarray([[-5.0, 1.0, 1.0]]), bound)
            np.testing.assert_allclose(np.asarray(far), 0.0, atol=1e-6)

    def test_grid_count(self):
        cm = grid_count(jnp.asarray([[1.0, 1.0, 1.0]]), (3, 3, 3))
        np.testing.assert_allclose(float(cm[1, 1, 1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(cm.sum()), 1.0, atol=1e-6)


class TestSplineOrders:
    """Spline orders 0–3 × bound modes vs `scipy.ndimage.map_coordinates`
    (`prefilter=False` — the reference kernel's treat-input-as-coefficients
    semantics, `monai/csrc/resample/pushpull_cpu.cpp` +
    `interpolation_common.h`)."""

    # zero-padding spline semantics = scipy's 'grid-constant' (plain
    # 'constant' short-circuits out-of-extent points to cval instead of
    # letting zero taps enter the stencil)
    SCIPY_MODE = {
        "zero": "grid-constant",
        "clamp": "nearest",
        "reflect": "mirror",
    }

    def _scipy_pull(self, vol, coords, order, mode):
        from scipy.ndimage import map_coordinates

        return np.stack(
            [
                map_coordinates(
                    np.asarray(vol[..., c], np.float64),
                    np.asarray(coords, np.float64).T,
                    order=order,
                    mode=self.SCIPY_MODE[mode],
                    cval=0.0,
                    prefilter=False,
                )
                for c in range(vol.shape[-1])
            ],
            axis=-1,
        )

    @pytest.mark.parametrize("order", [0, 1, 2, 3])
    @pytest.mark.parametrize("bound", ["zero", "clamp", "reflect"])
    def test_pull_matches_scipy(self, order, bound, rng):
        vol = jnp.asarray(rng.standard_normal((6, 5, 7, 2)), jnp.float32)
        # interior + near-edge coordinates (cubic taps reach 2 voxels out)
        coords = jnp.asarray(
            rng.uniform(0.0, np.array([5.0, 4.0, 6.0]), size=(40, 3)),
            jnp.float32,
        )
        got = np.asarray(grid_pull(vol, coords, bound, order))
        want = self._scipy_pull(vol, coords, order, bound)
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("order", [0, 1, 2, 3])
    @pytest.mark.parametrize("bound", ["clamp", "reflect"])
    def test_pull_matches_scipy_outside(self, order, bound, rng):
        # out-of-domain coordinates: extension semantics per bound mode
        vol = jnp.asarray(rng.standard_normal((6, 5, 7, 1)), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(-2.0, np.array([7.0, 6.0, 8.0]), size=(40, 3)),
            jnp.float32,
        )
        got = np.asarray(grid_pull(vol, coords, bound, order))
        want = self._scipy_pull(vol, coords, order, bound)
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("order", [2, 3])
    def test_push_is_adjoint_at_order(self, order, rng):
        vol = jnp.asarray(rng.standard_normal((5, 5, 5, 2)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, 4, size=(20, 3)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((20, 2)), jnp.float32)
        lhs = float(jnp.sum(grid_pull(vol, coords, "reflect", order) * u))
        rhs = float(
            jnp.sum(vol * grid_push(u, coords, (5, 5, 5), "reflect", order))
        )
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_per_dim_orders_and_bounds(self, rng):
        vol = jnp.asarray(rng.standard_normal((6, 5, 7, 1)), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(0.0, np.array([5.0, 4.0, 6.0]), size=(25, 3)),
            jnp.float32,
        )
        got = np.asarray(
            grid_pull(vol, coords, ("zero", "clamp", "reflect"), (1, 2, 3))
        )
        from scipy.ndimage import map_coordinates

        # separable check: per-dim order/bound == chaining 1-D interpolations
        # is not directly expressible in scipy; validate against a dense
        # direct evaluation of the separable stencil instead.
        from waveformer_tpu.ops.spatial import _spline_taps, _apply_bound

        want = np.zeros((25, 1), np.float32)
        cz = _spline_taps(coords[:, 0], 1)
        cy = _spline_taps(coords[:, 1], 2)
        cx = _spline_taps(coords[:, 2], 3)
        for rz, wz in cz:
            iz, mz = _apply_bound(rz, 6, "zero")
            for ry, wy in cy:
                iy, my = _apply_bound(ry, 5, "clamp")
                for rx, wx in cx:
                    ix, mx = _apply_bound(rx, 7, "reflect")
                    wgt = np.asarray(wz * wy * wx * mz * my * mx)
                    want[:, 0] += wgt * np.asarray(vol)[
                        np.asarray(iz), np.asarray(iy), np.asarray(ix), 0
                    ]
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_cubic_vjp_volume_grad_is_push(self, rng):
        vol = jnp.asarray(rng.standard_normal((5, 5, 5, 1)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, 4, size=(12, 3)), jnp.float32)

        def f(v):
            return jnp.sum(grid_pull(v, coords, "reflect", 3) ** 2)

        got = jax.grad(f)(vol)
        want = grid_push(
            2 * grid_pull(vol, coords, "reflect", 3),
            coords, (5, 5, 5), "reflect", 3,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    @pytest.mark.parametrize("order", [2, 3])
    def test_prefilter_interpolates(self, order, rng):
        from waveformer_tpu.ops.spatial import spline_prefilter

        vol = jnp.asarray(rng.standard_normal((12, 11, 13, 1)), jnp.float32)
        coeffs = spline_prefilter(vol, order)
        # pulling the coefficients at the grid points reproduces the data
        gz, gy, gx = np.meshgrid(
            np.arange(12), np.arange(11), np.arange(13), indexing="ij"
        )
        coords = jnp.asarray(
            np.stack([gz, gy, gx], -1).reshape(-1, 3), jnp.float32
        )
        got = np.asarray(
            grid_pull(coeffs, coords, "reflect", order)
        ).reshape(12, 11, 13)
        np.testing.assert_allclose(got, np.asarray(vol)[..., 0], atol=5e-4)

    @pytest.mark.parametrize("order", [2, 3])
    def test_prefilter_matches_scipy_spline_filter(self, order, rng):
        from scipy.ndimage import spline_filter

        from waveformer_tpu.ops.spatial import spline_prefilter

        vol = jnp.asarray(rng.standard_normal((9, 8, 10, 1)), jnp.float32)
        got = np.asarray(spline_prefilter(vol, order))[..., 0]
        want = spline_filter(
            np.asarray(vol)[..., 0].astype(np.float64), order=order,
            mode="mirror",
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


class TestCrissCross:
    def test_shapes_and_rowcol_reach(self, rng):
        import jax.numpy as jnp

        from waveformer_tpu.ops.cc_attention import criss_cross_attention

        q = jnp.asarray(rng.standard_normal((1, 5, 7, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 5, 7, 8)), jnp.float32)
        v = jnp.zeros((1, 5, 7, 4), jnp.float32)
        # put a unit signal at (2, 3): positions in row 2 or column 3 must
        # receive nonzero output; others must stay zero
        v = v.at[0, 2, 3, :].set(1.0)
        out = np.asarray(criss_cross_attention(q, k, v))
        assert np.abs(out[0, 2, :, :]).max() > 1e-6  # row reach
        assert np.abs(out[0, :, 3, :]).max() > 1e-6  # column reach
        mask = np.ones((5, 7), bool)
        mask[2, :] = False
        mask[:, 3] = False
        assert np.abs(out[0][mask]).max() < 1e-6

    def test_rows_sum_to_one_weighting(self, rng):
        import jax.numpy as jnp

        from waveformer_tpu.ops.cc_attention import criss_cross_attention

        q = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
        v = jnp.ones((1, 4, 4, 2), jnp.float32)
        out = np.asarray(criss_cross_attention(q, k, v))
        np.testing.assert_allclose(out, 1.0, atol=1e-5)  # convex combo of 1s


class TestSplitConverter:
    def test_txt_to_pkl(self, tmp_path):
        import pickle

        from waveformer_tpu.scripts.convert_split import txt_to_pkl

        txt = tmp_path / "cases.txt"
        txt.write_text("case_a\ncase_b\n\ncase_c\n")
        pkl = tmp_path / "cases.pkl"
        assert txt_to_pkl(str(txt), str(pkl)) == 3
        assert pickle.load(open(pkl, "rb")) == ["case_a", "case_b", "case_c"]
