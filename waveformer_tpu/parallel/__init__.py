from waveformer_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
)
from waveformer_tpu.parallel.tensor_sharding import (  # noqa: F401
    shard_params_tensor,
    tensor_param_specs,
)
