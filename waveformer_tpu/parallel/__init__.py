from waveformer_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
)
