from huggingface_asr_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    param_sharding,
    replicate,
)

__all__ = ["MeshConfig", "make_mesh", "batch_sharding", "param_sharding", "replicate"]
