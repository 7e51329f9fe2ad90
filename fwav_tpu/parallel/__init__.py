from .mesh import (
    DP_AXIS,
    TP_AXIS,
    bank_sharding,
    init_distributed,
    make_mesh,
    ranges_sharding,
    replicated,
)
from .shard import compress_audio_sharded, exact_search_sharded, exact_search_tp

__all__ = [
    "DP_AXIS",
    "TP_AXIS",
    "bank_sharding",
    "make_mesh",
    "ranges_sharding",
    "replicated",
    "compress_audio_sharded",
    "exact_search_sharded",
    "exact_search_tp",
    "init_distributed",
]
