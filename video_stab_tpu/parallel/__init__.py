"""Device-mesh multi-stream serving (vmap + sharding over a Mesh)."""

from video_stab_tpu.parallel.multistream import (
    MultiStreamStabilizer,
    batched_state_init,
    make_stream_mesh,
)

__all__ = ["MultiStreamStabilizer", "batched_state_init", "make_stream_mesh"]
