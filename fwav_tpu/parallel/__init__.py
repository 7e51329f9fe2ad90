from .mesh import (
    DP_AXIS,
    TP_AXIS,
    bank_sharding,
    init_distributed,
    make_mesh,
    ranges_sharding,
    replicated,
)
from .shard import compress_audio_sharded

__all__ = [
    "DP_AXIS",
    "TP_AXIS",
    "bank_sharding",
    "make_mesh",
    "ranges_sharding",
    "replicated",
    "compress_audio_sharded",
    "init_distributed",
]
