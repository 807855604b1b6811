from aid_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    make_multislice_mesh,
    frame_sharding,
    replicated,
    shard_params,
    shard_frames,
    sharded_denoise_sequence,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "make_multislice_mesh",
    "frame_sharding",
    "replicated",
    "shard_params",
    "shard_frames",
    "sharded_denoise_sequence",
]
