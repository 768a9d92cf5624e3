from waveformer_tpu.models.waveformer import (  # noqa: F401
    Waveformer,
    MultiscaleTransformer,
    create_waveformer,
)
from waveformer_tpu.models.blocks import WaveFormerBlock  # noqa: F401
from waveformer_tpu.models.attention import WindowAttention  # noqa: F401
from waveformer_tpu.models.conv_blocks import (  # noqa: F401
    ChannelCalibration,
    ProjectionHead,
)
