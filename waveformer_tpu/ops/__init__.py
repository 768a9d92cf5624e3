from waveformer_tpu.ops.wavelet import (  # noqa: F401
    DETAIL_KEYS,
    dwt3,
    idwt3,
    wavedec3,
    waverec3,
)
from waveformer_tpu.ops.resize import resize_trilinear  # noqa: F401
from waveformer_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_unpartition,
)
