"""CI coverage for the previously untested runnables: the grand-challenge
deploy wrapper (`waveformer_tpu/deploy/process.py`, reference
`light_training/process_framework/process.py:8`) and both example drivers
(`examples/*/run_example.py`, reference `light_training/examples/`).

Everything runs at toy scale; slow-marked because each drives a full
pipeline on one CPU core.
"""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)

TINY_NETWORK_YAML = """\
compute_dtype: "float32"

prediction:
  patch_size: [16, 16, 16]
  sw_batch_size: 2
  overlap: 0.25
  mirror_axes: [0, 1, 2]

network:
  in_channels: 2
  out_channels: 3
  img_size: [16, 16, 16]
  patch_size: 2
  transformer:
    embed_dims: [4, 8, 16, 32]
    depths: [1, 1, 1, 1]
    num_heads: [1, 2, 4, 4]
    decom_levels: [3, 2, 1, 0]
    drop_path_rate: 0.0
"""


@pytest.mark.slow
class TestDeployProcess:
    def test_one_case_input_to_output(self, tmp_path, rng):
        """/input → /output single-case run: raw NIfTIs in, a segmentation
        in the SOURCE geometry out."""
        import jax
        import jax.numpy as jnp

        from waveformer_tpu.config import load_config
        from waveformer_tpu.deploy.process import main as deploy_main
        from waveformer_tpu.models import create_waveformer
        from waveformer_tpu.training.checkpoint import save_params_npz
        from waveformer_tpu.utils import nifti

        cfg_path = tmp_path / "config.yaml"
        cfg_path.write_text(TINY_NETWORK_YAML)
        cfg = load_config(str(cfg_path))

        # checkpoint matching the tiny network
        model = create_waveformer(
            cfg.network.model_kwargs(), dtype=jnp.float32,
            io_layout="channels_first",
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 16))
        )
        ckpt = str(tmp_path / "model.npz")
        save_params_npz(jax.device_get(params), ckpt)

        # one raw case, LPS orientation (non-identity direction)
        affine = np.diag([-1.0, -1.0, 1.0, 1.0]).astype(np.float32)
        case = tmp_path / "input" / "case_A"
        case.mkdir(parents=True)
        shape = (20, 24, 18)
        for mod in ("a.nii.gz", "b.nii.gz"):
            vol = rng.normal(0, 1, shape).astype(np.float32)
            nifti.save(nifti.NiftiImage(data=vol, affine=affine),
                       str(case / mod))

        out_dir = tmp_path / "output"
        deploy_main([
            "--checkpoint", ckpt,
            "--config", str(cfg_path),
            "--input-dir", str(tmp_path / "input"),
            "--output-dir", str(out_dir),
            "--modalities", "a.nii.gz", "b.nii.gz",
            "--no-tta",
        ])
        out = nifti.load(str(out_dir / "case_A.nii.gz"))
        # source geometry restored: same voxel shape + same affine
        assert tuple(out.data.shape) == shape
        np.testing.assert_allclose(np.asarray(out.affine), affine, atol=1e-5)
        assert set(np.unique(out.data)) <= {0, 1, 2}


@pytest.mark.slow
class TestExampleDrivers:
    def _run(self, name, tmp_path):
        sys.path.insert(0, os.path.join(EXAMPLES, name))
        try:
            import importlib

            mod = importlib.import_module("run_example")
            importlib.reload(mod)  # both examples define run_example
            mod.main([
                "--workdir", str(tmp_path / name),
                "--cases", "4",
                "--epochs", "1",
                "--steps", "3",
            ])
        finally:
            sys.path.pop(0)
        workdir = tmp_path / name
        assert (workdir / "result_metrics.npy").exists()
        metrics = np.load(workdir / "result_metrics.npy")
        assert metrics.ndim == 3 and metrics.shape[1:] == (2, 2)
        preds = list((workdir / "predictions").glob("*.nii.gz"))
        assert preds

    def test_abdomen_ct_example(self, tmp_path):
        self._run("abdomen_ct", tmp_path)

    def test_liver_ct_example(self, tmp_path):
        self._run("liver_ct", tmp_path)

    def test_brats2023_example(self, tmp_path):
        """Flagship-dataset toy driver: (N, 3, 2) TC/WT/ET metric array
        (`5_compute_metrics.py` protocol) instead of the 2-organ shape."""
        sys.path.insert(0, os.path.join(EXAMPLES, "brats2023"))
        try:
            import importlib

            mod = importlib.import_module("run_example")
            importlib.reload(mod)
            mod.main([
                "--workdir", str(tmp_path / "brats2023"),
                "--cases", "4",
                "--epochs", "1",
                "--steps", "3",
            ])
        finally:
            sys.path.pop(0)
        workdir = tmp_path / "brats2023"
        metrics = np.load(workdir / "result_metrics.npy")
        assert metrics.ndim == 3 and metrics.shape[1:] == (3, 2)
        preds = list((workdir / "predictions").glob("*.nii.gz"))
        assert preds
