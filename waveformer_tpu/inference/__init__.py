from waveformer_tpu.inference.sliding_window import (  # noqa: F401
    SlidingWindowInferer,
    compute_importance_map,
    dense_patch_starts,
    sliding_window_inference,
)
from waveformer_tpu.inference.predictor import Predictor  # noqa: F401
