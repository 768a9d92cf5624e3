from waveformer_tpu.ops.wavelet import (  # noqa: F401
    DETAIL_KEYS,
    dwt3,
    idwt3,
    register_wavelet,
    wavedec3,
    waverec3,
)
from waveformer_tpu.ops.resize import resize_trilinear  # noqa: F401
from waveformer_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_unpartition,
    window_unpartition_flat,
)
from waveformer_tpu.ops.bilateral import (  # noqa: F401
    TrainableBilateralFilter,
    bilateral_filter,
    joint_bilateral_filter,
)
from waveformer_tpu.ops.gmm import (  # noqa: F401
    GMMParams,
    gmm_fit,
    gmm_posterior,
    gmm_segment,
)
from waveformer_tpu.ops.spatial import (  # noqa: F401
    grid_count,
    grid_pull,
    grid_push,
)
from waveformer_tpu.ops.cc_attention import criss_cross_attention  # noqa: F401
