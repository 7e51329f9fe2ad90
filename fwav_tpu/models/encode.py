"""Encode engine: compress_audio (reference: fractal.py:1045-1273).

The reference's encode is a heterogeneous pipeline — N CPU search processes
feeding a GPU solve process through bounded mp.Queues, with memmapped domain
banks and an optional hnswlib index. On TPU all of that collapses into ONE
jitted XLA program per shape bucket:

    padded signal -> VAD mask (cummax hysteresis) -> ranges
    raw signal    -> box-mean domain bank (shifted adds + gather)
    search        -> blockwise matched-filter argmax (exact, default)
                     or embeddings + blockwise top-k MIPS + affine solve
    sentinels     -> energy-pruned / padded ranges emit (-1, 1, 0, 0, 0)

Static-shape discipline: signal length, range count and domain count are
bucketed ({2^k, 3*2^(k-1)} grid) and masked; one compile per bucket triple.

The public compress_audio keeps the reference's signature and 8-tuple return
(matches list, domains, n_ranges, range_size, tile_size, domain_step,
energy_thresh, original_len). compress_audio_arrays is the fast-path variant
returning a packed match record array instead of a Python tuple list.

Sentinel policy: silent (energy-pruned) ranges are stored as the format's
true (-1, 1.0, 0.0, 0, 0.0) sentinel. The reference's live pipeline instead
stored (domain 0, s~0, o~0, 0, +inf) because its all-inf argmin picked slot 0
(fractal.py:816-825); its own decoder fully supports -1 (fractal.py:1398-1426)
and the dead _worker_batch path emitted exactly this tuple (fractal.py:1037).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from ..io.container import MATCH_DTYPE
from ..ops.affine import affine_stats
from ..ops.dct import multi_head_embedding_batch
from ..ops.domains import build_bank_jax, build_domains_host, n_domains_for
from ..ops.search import (
    coarse_refine_search,
    exact_search_block,
    topk_search_block,
)
from ..ops.vad import voiced_detection
from ..utils.buckets import bucket
from ..utils.logging import device_banner
from ..utils.trace import phase


import threading

#: One chip, one compute queue: concurrent jitted dispatch from batch worker
#: threads can wedge tunneled device transports, and on real hardware it
#: serializes anyway. Host-side work stays parallel.
DEVICE_LOCK = threading.Lock()


def _pow2_divisor(n: int, cap: int) -> int:
    p = 1
    while n % (p * 2) == 0 and p * 2 <= cap:
        p *= 2
    return p


def build_encode_core(
    nb: int,
    lb: int,
    db: int,
    tile_size: int,
    range_size: int,
    domain_step: int,
    search: str,
    top_k: int,
    emb_dim: int,
    fast_mode: bool,
    s_clip: float,
    domain_block: int,
    range_block: int,
    objective: str,
    coarse_stride: int = 64,
    coarse_topc: int = 2,
    use_pallas: bool = False,
):
    """Build the (unjitted) fused encode program for one shape bucket.
    Signature of the returned fn:
    (weighted (lb,), raw (nb,), n_samples, n_ranges, n_domains,
     energy_thresh) -> (idx, s, o, sym, err).

    The domain bank is built on-device for searching but NOT returned —
    the host rebuilds it independently (ops.domains.build_domains_host) for
    serialization, because the device->host path is orders of magnitude
    slower than host compute for bank-sized payloads."""
    n = range_size
    mb = lb // n
    dblk = _pow2_divisor(db, domain_block)
    rblk = _pow2_divisor(mb, range_block)

    def core(weighted, raw, n_samples, n_ranges, n_domains, energy_thresh):
        bank = build_bank_jax(raw, tile_size, range_size, domain_step, db, n_domains)
        d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
        ranges = weighted.reshape(mb, n)

        if search == "exact":
            d_mean, d_denom = affine_stats(bank)
            if use_pallas:
                from ..ops.pallas_search import exact_search_scan_pallas
                from ..ops.search import domain_weights, exact_refit

                bankT = bank.T
                d_weight = domain_weights(d_mean, d_denom, n, objective)

                def do_block(rb):
                    r_mean = jnp.mean(rb, axis=1)
                    r_c = rb - r_mean[:, None]
                    score, bidx, bsym = exact_search_scan_pallas(
                        r_c, bankT, d_weight, d_valid,
                        range_block=min(512, rblk) if rblk % 512 == 0 or rblk < 512 else 256,
                        domain_block=dblk,
                    )
                    return exact_refit(r_mean, r_c, bank, score, bidx, bsym, s_clip)
            else:
                def do_block(rb):
                    return exact_search_block(
                        rb, bank, d_mean, d_denom, d_valid, dblk, s_clip,
                        objective=objective,
                    )
        elif search == "coarse":
            d_mean, d_denom = affine_stats(bank)
            cdblk = _pow2_divisor(db // coarse_stride, domain_block)
            if use_pallas and coarse_topc == 1:
                # fused Pallas scan for the coarse lobes: keeps score tiles
                # in VMEM instead of round-tripping them through HBM
                # (measured 35 vs 87 ms on the 10s bench shapes)
                from ..ops.pallas_search import exact_search_scan_pallas
                from ..ops.search import domain_weights, refine_from_lobes

                dc = db // coarse_stride
                bank_subT = bank.reshape(dc, coarse_stride, n)[:, 0, :].T
                w_sub = domain_weights(d_mean, d_denom, n, objective).reshape(
                    dc, coarse_stride
                )[:, 0]
                v_sub = d_valid.reshape(dc, coarse_stride)[:, 0]
                prb = 512 if rblk % 512 == 0 else _pow2_divisor(rblk, 512)

                def do_block(rb):
                    r_c = rb - jnp.mean(rb, axis=1, keepdims=True)
                    score, cidx, _ = exact_search_scan_pallas(
                        r_c, bank_subT, w_sub, v_sub, prb, cdblk
                    )
                    lobes = jnp.where(jnp.isfinite(score), cidx, -1)[:, None]
                    return refine_from_lobes(
                        rb, bank, d_valid, lobes, coarse_stride, s_clip,
                        objective,
                    )
            else:
                def do_block(rb):
                    return coarse_refine_search(
                        rb, bank, d_mean, d_denom, d_valid, coarse_stride,
                        coarse_topc, cdblk, s_clip, objective=objective,
                    )
        else:
            bank_emb = multi_head_embedding_batch(
                bank, tonal_k=emb_dim // 2, transient_k=emb_dim // 2
            )

            def do_block(rb):
                return topk_search_block(
                    rb, bank, bank_emb, d_valid, top_k, dblk, s_clip, emb_dim,
                    objective=objective,
                )

        outs = jax.lax.map(do_block, ranges.reshape(mb // rblk, rblk, n))
        idx, s, o, sym, err = (x.reshape(mb) for x in outs)

        # sentinels: energy-pruned (fast_mode, 0.75*thresh on mean power —
        # fractal.py:602) and bucket-pad rows
        r_pow = jnp.mean(ranges * ranges, axis=1)
        r_valid = jnp.arange(mb, dtype=jnp.int32) < n_ranges
        silent = (r_pow < energy_thresh * 0.75) if fast_mode else jnp.zeros(mb, bool)
        dead = silent | ~r_valid | ~jnp.isfinite(err)
        idx = jnp.where(dead, -1, idx)
        s = jnp.where(dead, 1.0, s)
        o = jnp.where(dead, 0.0, o)
        sym = jnp.where(dead, 0, sym).astype(bool)
        err = jnp.where(dead, 0.0, err)
        # one packed output = one device->host transfer. idx fits float32
        # exactly (< 2^24 domains per shard by construction); err >= 0, so
        # the mirror flag rides its sign bit (sym=1 -> -err, incl. -0.0).
        err_signed = jnp.where(sym, -err, err)
        return jnp.stack([idx.astype(jnp.float32), s, o, err_signed])

    return core


@lru_cache(maxsize=64)
def _encode_core(*key):
    """Jitted + cached variant of build_encode_core, one entry per bucket."""
    return jax.jit(build_encode_core(*key))


def _empty_result(range_size, tile_size, domain_step, energy_thresh, original_len, arrays):
    matches = np.empty(0, dtype=MATCH_DTYPE) if arrays else []
    return (
        matches,
        np.zeros((0, range_size), dtype=np.float32),
        0,
        range_size,
        tile_size,
        domain_step,
        energy_thresh,
        original_len,
    )


def compress_audio_arrays(
    signal,
    framerate,
    sampwidth,
    tile_size: int = 1024,
    emb_dim: int = 16,
    top_k: int = 32,
    ef_search: int = 50,
    use_gpu: bool = False,
    energy_thresh: float = 1e-4,
    domains_tmpdir=None,
    batch_size_gpu: int = 512,
    batch_size_cpu: int = 128,
    fast_mode: bool = True,
    transient_weight: float = 1.0,
    n_mels: int = 40,
    cpu_workers=None,
    search: str = "auto",
    objective: str = "balanced",
    config: EncoderConfig | None = None,
    _weighted_override=None,
    _defer_d2h: bool = False,
):
    """Fast-path encode returning a packed match record array.

    The reference-signature kwargs (ef_search, use_gpu, batch sizes,
    cpu_workers, domains_tmpdir, transient_weight, n_mels) are accepted for
    API compatibility; on TPU there are no worker processes, no ANN index and
    no memmap staging for in-memory signals, so they are no-ops.
    """
    del ef_search, use_gpu, domains_tmpdir, batch_size_gpu, batch_size_cpu
    del transient_weight, n_mels, cpu_workers
    device_banner()

    cfg = config or EncoderConfig(
        tile_size=tile_size,
        emb_dim=emb_dim,
        top_k=top_k,
        energy_thresh=energy_thresh,
        fast_mode=fast_mode,
        search=search,
        objective=objective,
    )
    range_size = cfg.range_size
    domain_step = cfg.domain_step

    signal = np.ascontiguousarray(np.asarray(signal, dtype=np.float32))
    original_len = len(signal)

    if _weighted_override is not None:
        # streaming shard mode (models.stream): the caller already ran the
        # global VAD + padding; `signal` is the shard's domain-search window
        # and the returned bank is None (serialized separately).
        weighted = np.ascontiguousarray(_weighted_override, dtype=np.float32)
        assert len(weighted) % range_size == 0
    else:
        # --- VAD prepass: mask multiplies, silence is zeroed (fractal.py:1074-1079)
        with phase("vad"):
            voiced = voiced_detection(
                signal, frame_size=range_size * 2, energy_threshold=cfg.energy_thresh
            )
            weighted = signal * voiced
        if float(np.sum(weighted.astype(np.float64) ** 2)) < 1e-8:
            return _empty_result(
                range_size, cfg.tile_size, domain_step, cfg.energy_thresh,
                original_len, arrays=True,
            )
        # reflect-pad to a whole number of ranges (fractal.py:1095-1097)
        pad_len = (range_size - (original_len % range_size)) % range_size
        if pad_len:
            weighted = np.pad(weighted, (0, pad_len), mode="reflect")
    L = len(weighted)
    n_ranges = L // range_size

    n_domains = n_domains_for(original_len, cfg.tile_size, domain_step)
    if n_ranges == 0 or n_domains == 0:
        return _empty_result(
            range_size, cfg.tile_size, domain_step, cfg.energy_thresh,
            original_len, arrays=True,
        )
    if n_domains >= 1 << 24:
        raise ValueError(
            f"{n_domains} domains exceeds the single-shot encoder's 2^24 "
            "index range; use models.stream.compress_audio_streaming "
            "(process_file_compress selects it automatically)"
        )

    # --- bucket + pad, then one fused device program
    # Scale normalization: float32 search arithmetic on raw PCM amplitudes
    # (~3e4) loses ~7 significant digits on squared terms; working near unit
    # scale keeps the selection scores and refit well-conditioned. s is
    # scale-invariant; o/err are rescaled on the way out.
    scale = float(np.max(np.abs(signal))) or 1.0
    inv = np.float32(1.0 / scale)
    nb = bucket(original_len, 4096)
    # bucket the RANGE COUNT, not the sample count: lb must be an exact
    # multiple of range_size for the (mb, N) reshape (range_size can have
    # odd factors, e.g. tile_size=1536 -> range_size=6)
    lb = bucket(n_ranges, 256) * range_size
    db = bucket(n_domains, 256)
    raw_p = np.zeros(nb, dtype=np.float32)
    raw_p[:original_len] = signal
    raw_p *= inv
    wtd_p = np.zeros(lb, dtype=np.float32)
    wtd_p[:L] = weighted
    wtd_p *= inv

    # resolve the search mode: coarse pays off once the bank dwarfs the
    # refine windows; the stride must stay well under the box-mean width
    block_len = cfg.tile_size // range_size
    search_mode = cfg.search
    stride = min(cfg.coarse_stride, max(1, block_len // 4))
    stride = 1 << (stride.bit_length() - 1)  # largest pow2 <= stride
    if search_mode == "auto":
        search_mode = (
            "coarse"
            if db >= max(cfg.auto_coarse_threshold, 256 * stride) and stride > 1
            else "exact"
        )

    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    core = _encode_core(
        nb, lb, db, cfg.tile_size, range_size, domain_step, search_mode,
        cfg.top_k, cfg.emb_dim, cfg.fast_mode, cfg.s_clip, cfg.domain_block,
        cfg.range_block, cfg.objective, stride, cfg.coarse_topc,
        bool(use_pallas),
    )
    if _defer_d2h:
        # streaming pipeline mode (models.stream): the CALLER holds
        # DEVICE_LOCK, dispatches the next shard before collecting this one
        # (single-threaded async overlap) and materializes the record later
        # with collect_packed_matches.
        packed = core(
            jnp.asarray(wtd_p),
            jnp.asarray(raw_p),
            jnp.int32(original_len),
            jnp.int32(n_ranges),
            jnp.int32(n_domains),
            jnp.float32(cfg.energy_thresh / (scale * scale)),
        )
        return packed, scale, n_ranges

    with DEVICE_LOCK, phase("device"):
        packed = core(
            jnp.asarray(wtd_p),
            jnp.asarray(raw_p),
            jnp.int32(original_len),
            jnp.int32(n_ranges),
            jnp.int32(n_domains),
            jnp.float32(cfg.energy_thresh / (scale * scale)),
        )

        # while the device runs: the serialized bank is rebuilt host-side
        # (cumsum box means) — cheaper than pulling it over the
        # device->host link and equal in float32 to well within decode
        # tolerance. Streaming shards serialize the bank separately.
        if _weighted_override is None:
            with phase("host_bank"):
                bank = build_domains_host(signal, cfg.tile_size, range_size, domain_step)
            assert len(bank) == n_domains
        else:
            bank = None

        with phase("d2h"):
            rec = collect_packed_matches(packed, scale, n_ranges)

    return (
        rec,
        bank,
        n_ranges,
        range_size,
        cfg.tile_size,
        domain_step,
        cfg.energy_thresh,
        original_len,
    )


def collect_packed_matches(packed, scale: float, n_ranges: int) -> np.ndarray:
    """Device->host transfer + record materialization for a packed (4, M)
    encode output (the counterpart of build_encode_core's packing: the
    mirror flag is the sign bit of the err row)."""
    idx, s, o, err_signed = np.asarray(jax.device_get(packed))
    rec = np.empty(n_ranges, dtype=MATCH_DTYPE)
    rec["idx"] = idx[:n_ranges].astype(np.int32)
    rec["s"] = s[:n_ranges]
    rec["o"] = o[:n_ranges] * scale
    rec["sym"] = np.signbit(err_signed[:n_ranges]).astype(np.uint8)
    rec["err"] = np.abs(err_signed[:n_ranges]) * scale
    return rec


def prune_bank(rec: np.ndarray, bank: np.ndarray):
    """Drop every domain row the match table never references and reindex.

    The reference serializes the ENTIRE sliding-window bank — n_domains ~
    n_samples rows — which inflates the container ~10x over the input
    (SURVEY.md §2.4.5, README.md:356 'not yet competitive'). Matches
    reference at most n_ranges distinct domains, so the pruned bank is
    bounded by the range count regardless of duration. The output is still
    a perfectly ordinary .fwav: decoders (ours and the reference's) only
    ever gather rows by index. Round-trip output is bit-identical.

    When every match is a sentinel, one zero row is kept instead of an
    empty bank: the reference's load_compressed crashes on n_domains=0
    (np.vstack of nothing, fractal.py:1372), so an all-silent pruned file
    stays loadable by both decoders.

    Returns (rec', bank') — rec is not modified in place."""
    used = np.unique(rec["idx"][rec["idx"] >= 0])
    if used.size == 0 and len(bank):
        return rec.copy(), np.zeros((1, bank.shape[1]), dtype=np.float32)
    return remap_matches(rec, used), np.ascontiguousarray(bank[used])


def remap_matches(rec: np.ndarray, used: np.ndarray) -> np.ndarray:
    """Reindex live matches against the SORTED kept-row list `used` —
    O(live log used), no bank-sized allocation. Shared by prune_bank and
    the streaming prune path (models.codec)."""
    out = rec.copy()
    live = out["idx"] >= 0
    out["idx"][live] = np.searchsorted(used, out["idx"][live]).astype(np.int32)
    return out


def compress_audio(signal, framerate, sampwidth, **kwargs):
    """Reference-shaped encode: returns (matches LIST of 5-tuples, domains,
    n_ranges, range_size, tile_size, domain_step, energy_thresh,
    original_len) exactly like fractal.py:1045's public API."""
    from ..io.container import struct_to_matches

    rec, *rest = compress_audio_arrays(signal, framerate, sampwidth, **kwargs)
    matches = struct_to_matches(rec) if isinstance(rec, np.ndarray) else rec
    return (matches, *rest)
