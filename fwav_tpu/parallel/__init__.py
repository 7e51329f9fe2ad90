from .mesh import DP_AXIS, TP_AXIS, bank_sharding, make_mesh, ranges_sharding, replicated
from .shard import exact_search_sharded, exact_search_tp, shard_encode_inputs

__all__ = [
    "DP_AXIS",
    "TP_AXIS",
    "bank_sharding",
    "make_mesh",
    "ranges_sharding",
    "replicated",
    "exact_search_sharded",
    "exact_search_tp",
    "shard_encode_inputs",
]
