"""waveformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for 3D
wavelet-attention medical image segmentation.

Re-designed from scratch with the capabilities of the WaveFormer reference
(arXiv 2503.23764): an nnUNet-style preprocessing + patch-training pipeline,
a 3D wavelet/window-attention U-shaped transformer, sliding-window full-volume
inference with Gaussian blending and mirror TTA, Dice/HD95 metrics, and a
self-supervised pretraining stack — all built TPU-first (channels-last
layouts, static shapes, `jax.sharding` meshes, Pallas kernels on the hot path).
"""

__version__ = "0.1.0"

from waveformer_tpu.config import (  # noqa: F401
    Config,
    NetworkConfig,
    load_config,
)
