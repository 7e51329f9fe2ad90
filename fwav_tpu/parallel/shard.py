"""Multi-chip encode/search (SURVEY.md §2.5, §7 M5).

Two composable shardings on a (dp, tp) mesh:

1. Range data-parallelism (dp): ranges are embarrassingly parallel — shard
   the (M, N) range matrix over dp, replicate the bank, jit the same search
   kernels; GSPMD partitions the matmuls with zero communication. This
   replaces the reference's np.array_split over CPU worker processes
   (fractal.py:1180-1207).

2. Bank tensor-parallelism (tp): when the domain bank outgrows one chip, each
   chip scans only its bank shard (local running best), then the per-shard
   winners are merged with one all_gather of (score, idx, sym) triples —
   "top-1 of top-1s". The refit (exact s/o/err of the winning tile) happens
   on the shard that owns the winning tile and is combined with a psum.
   Deterministic tie-breaks match the single-device kernel: higher score,
   then lower global domain index, then original orientation before mirror.

Both paths produce bit-identical matches to the single-device kernel
(tests/test_sharding.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.affine import affine_stats
from ..ops.search import exact_refit, exact_search_scan, merge_shard_bests
from .mesh import DP_AXIS, TP_AXIS

#: Back-compat alias; the merge lives in ops.search so models.encode's
#: sharded cores can use it without a parallel<->models import cycle.
_merge_shard_bests = merge_shard_bests


def exact_search_tp(
    ranges: jnp.ndarray,     # (M, N) replicated over tp
    bank_shard: jnp.ndarray,  # (D_local, N) this chip's bank shard
    d_valid_shard: jnp.ndarray,
    domain_block: int,
    s_clip: float,
    objective: str,
    axis_name: str = TP_AXIS,
):
    """Bank-sharded exact search body (call inside shard_map). Returns
    (idx, s, o, sym, err) with GLOBAL domain indices, identical to the
    single-device exact_search_block over the concatenated bank."""
    M, N = ranges.shape
    d_local = bank_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * d_local

    r_mean = jnp.mean(ranges, axis=1)
    r_c = ranges - r_mean[:, None]

    d_mean, d_denom = affine_stats(bank_shard)
    score, idx, sym = exact_search_scan(
        r_c, bank_shard, d_mean, d_denom, d_valid_shard, domain_block,
        objective, idx_offset=offset,
    )
    score, idx, sym = _merge_shard_bests(score, idx, sym, axis_name)

    # refit on the owning shard only, then psum the one-hot contributions
    local = (idx >= offset) & (idx < offset + d_local)
    local_idx = jnp.where(local, idx - offset, 0)
    _, s, o, sym_u8, err = exact_refit(
        r_mean, r_c, bank_shard, score, local_idx, sym, s_clip
    )
    z = jnp.float32(0.0)
    s = jax.lax.psum(jnp.where(local, s, z), axis_name)
    o = jax.lax.psum(jnp.where(local, o, z), axis_name)
    # err may be inf (no valid domain anywhere): make the owner carry it
    err = jax.lax.psum(jnp.where(local, jnp.where(jnp.isinf(err), 3.4e38, err), z), axis_name)
    err = jnp.where(err >= 3.4e38, jnp.inf, err)
    return idx, s, o, sym_u8, err


@lru_cache(maxsize=16)
def _tp_search_fn(mesh, domain_block: int, s_clip: float, objective: str):
    body = partial(
        exact_search_tp,
        domain_block=domain_block,
        s_clip=s_clip,
        objective=objective,
        axis_name=TP_AXIS,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None), P(TP_AXIS, None), P(TP_AXIS)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def exact_search_sharded(
    ranges, bank, d_valid, mesh, domain_block: int = 2048,
    s_clip: float = 16.0, objective: str = "balanced",
):
    """Public entry: exact search with the bank sharded over the mesh's tp
    axis. ranges replicated; outputs replicated."""
    tp = mesh.shape[TP_AXIS]
    if bank.shape[0] % (tp * domain_block):
        raise ValueError(
            f"bank rows ({bank.shape[0]}) must divide evenly into "
            f"tp={tp} shards of {domain_block}-row blocks; pad the bank "
            "(with d_valid=False rows) to a multiple first"
        )
    fn = _tp_search_fn(mesh, domain_block, float(s_clip), objective)
    ranges = jax.device_put(ranges, NamedSharding(mesh, P(None, None)))
    bank = jax.device_put(bank, NamedSharding(mesh, P(TP_AXIS, None)))
    d_valid = jax.device_put(d_valid, NamedSharding(mesh, P(TP_AXIS)))
    return fn(ranges, bank, d_valid)


def compress_audio_sharded(signal, framerate, sampwidth, mesh=None,
                           config=None, **kwargs):
    """Multi-chip encode over a (dp, tp) mesh (SURVEY.md §2.5, §7 M5):
    ranges data-parallel over dp (the TPU analog of the reference's
    np.array_split over CPU worker processes, fractal.py:1180-1182), the
    domain bank tensor-sharded over tp when it outgrows one chip's HBM.

    Delegates to the SAME fused core as single-device encode
    (models.encode.build_encode_core run under shard_map — no forked
    pipeline): coarse/exact/Pallas modes, device-side VAD, idx-only
    device->host protocol and host refit all apply, and the output records
    are BIT-EQUAL to compress_audio_arrays on one device
    (tests/test_sharding.py). Same return contract as
    compress_audio_arrays; encoder knobs via EncoderConfig/kwargs."""
    import numpy as np

    from ..config import EncoderConfig
    from ..models.encode import _compress_fast
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    cfg = config or EncoderConfig(**kwargs)
    signal = np.ascontiguousarray(np.asarray(signal, dtype=np.float32))
    return _compress_fast(signal, cfg, mesh=mesh)


