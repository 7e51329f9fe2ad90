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
from ..ops.search import exact_refit, exact_search_scan
from .mesh import DP_AXIS, TP_AXIS


def _merge_shard_bests(score, idx, sym, axis_name):
    """all_gather the per-shard (score, idx, sym) and reduce with the
    single-device tie-break order: max score, then min global idx, then
    sym=0 first. Inputs are (M,) per shard; returns merged (M,) triples."""
    scores = jax.lax.all_gather(score, axis_name)   # (S, M)
    idxs = jax.lax.all_gather(idx, axis_name)
    syms = jax.lax.all_gather(sym, axis_name)

    n_shards = scores.shape[0]
    best_s, best_i, best_y = scores[0], idxs[0], syms[0]
    for k in range(1, n_shards):
        s_k, i_k, y_k = scores[k], idxs[k], syms[k]
        better = s_k > best_s
        tie = s_k == best_s
        take = better | (tie & (i_k < best_i)) | (
            tie & (i_k == best_i) & (~y_k & best_y)
        )
        best_s = jnp.where(take, s_k, best_s)
        best_i = jnp.where(take, i_k, best_i)
        best_y = jnp.where(take, y_k, best_y)
    return best_s, best_i, best_y


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


@lru_cache(maxsize=32)
def _dp_encode_core(
    mesh, nb: int, mb: int, db: int, tile_size: int, range_size: int,
    domain_step: int, s_clip: float, domain_block: int, objective: str,
    fast_mode: bool,
):
    """Jitted whole-mesh encode step: ranges (mb, N) sharded over dp, raw
    signal replicated, bank built redundantly per device (cheap), exact
    search GSPMD-partitioned over the range axis with zero communication."""
    import jax.numpy as jnp

    from ..ops.domains import build_bank_jax
    from ..ops.search import exact_search_block

    n = range_size
    dblk = domain_block
    while db % dblk:
        dblk //= 2

    def core(ranges, raw, n_ranges, n_domains, energy_thresh):
        bank = build_bank_jax(raw, tile_size, range_size, domain_step, db, n_domains)
        d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
        d_mean, d_denom = affine_stats(bank)
        idx, s, o, sym, err = exact_search_block(
            ranges, bank, d_mean, d_denom, d_valid, dblk, s_clip,
            objective=objective,
        )
        r_pow = jnp.mean(ranges * ranges, axis=1)
        r_valid = jnp.arange(mb, dtype=jnp.int32) < n_ranges
        silent = (r_pow < energy_thresh * 0.75) if fast_mode else jnp.zeros(mb, bool)
        dead = silent | ~r_valid | ~jnp.isfinite(err)
        return (
            jnp.where(dead, -1, idx),
            jnp.where(dead, 1.0, s),
            jnp.where(dead, 0.0, o),
            jnp.where(dead, 0, sym).astype(jnp.uint8),
            jnp.where(dead, 0.0, err),
        )

    return jax.jit(core)


def compress_audio_sharded(signal, framerate, sampwidth, mesh=None,
                           tile_size: int = 1024, energy_thresh: float = 1e-4,
                           objective: str = "balanced", s_clip: float = 16.0,
                           domain_block: int = 2048, fast_mode: bool = True):
    """Multi-chip encode: the full pipeline with ranges data-parallel over
    the mesh's dp axis (SURVEY.md §2.5 — the TPU analog of the reference's
    np.array_split over CPU worker processes, fractal.py:1180-1182).
    Same return contract as models.encode.compress_audio_arrays."""
    import numpy as np

    from ..config import derive_domain_step, derive_range_size
    from ..io.container import MATCH_DTYPE
    from ..ops.domains import build_domains_host, n_domains_for
    from ..ops.vad import voiced_detection
    from ..utils.buckets import bucket
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    range_size = derive_range_size(tile_size)
    step = derive_domain_step(range_size)
    signal = np.ascontiguousarray(np.asarray(signal, dtype=np.float32))
    original_len = len(signal)

    voiced = voiced_detection(signal, frame_size=2 * range_size,
                              energy_threshold=energy_thresh)
    weighted = signal * voiced
    n_domains = n_domains_for(original_len, tile_size, step)
    if float(np.sum(weighted.astype(np.float64) ** 2)) < 1e-8 or n_domains == 0:
        return (np.empty(0, dtype=MATCH_DTYPE),
                np.zeros((0, range_size), np.float32), 0, range_size,
                tile_size, step, energy_thresh, original_len)

    pad = (range_size - (original_len % range_size)) % range_size
    if pad:
        weighted = np.pad(weighted, (0, pad), mode="reflect")
    L = len(weighted)
    n_ranges = L // range_size

    scale = float(np.max(np.abs(signal))) or 1.0
    nb = bucket(original_len, 4096)
    db = bucket(n_domains, 256)
    # mb divisible by the dp extent so the shard is even (round the bucket
    # up to the next multiple of n_dev — doubling never reaches divisibility
    # for device counts with odd factors)
    mb = bucket(n_ranges, 256)
    mb = ((mb + n_dev - 1) // n_dev) * n_dev

    ranges_p = np.zeros((mb, range_size), np.float32)
    ranges_p[:n_ranges] = weighted.reshape(n_ranges, range_size) / scale
    raw_p = np.zeros(nb, np.float32)
    raw_p[:original_len] = signal / scale

    ranges_dev = jax.device_put(ranges_p, NamedSharding(mesh, P(DP_AXIS, None)))
    raw_dev = jax.device_put(raw_p, NamedSharding(mesh, P()))

    core = _dp_encode_core(mesh, nb, mb, db, tile_size, range_size, step,
                           s_clip, domain_block, objective, fast_mode)
    import jax.numpy as jnp

    idx, s, o, sym, err = jax.device_get(core(
        ranges_dev, raw_dev, jnp.int32(n_ranges), jnp.int32(n_domains),
        jnp.float32(energy_thresh / (scale * scale)),
    ))

    rec = np.empty(n_ranges, dtype=MATCH_DTYPE)
    rec["idx"] = idx[:n_ranges]
    rec["s"] = s[:n_ranges]
    rec["o"] = o[:n_ranges] * scale
    rec["sym"] = sym[:n_ranges]
    rec["err"] = err[:n_ranges] * scale
    bank = build_domains_host(signal, tile_size, range_size, step)
    return (rec, bank, n_ranges, range_size, tile_size, step, energy_thresh,
            original_len)


