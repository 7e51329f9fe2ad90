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
    device_vad: bool = False,
    pack: str = "full",
    in_i16: bool = False,
):
    """Build the (unjitted) fused encode program for one shape bucket.

    Two input protocols (static `device_vad`):

    - device_vad=False (legacy / streaming-shard): the host ran VAD, padding
      and scale normalization; fn(weighted (lb,), raw (nb,), n_samples,
      n_ranges, n_domains, energy_thresh_normalized).
    - device_vad=True (default single-shot path): ONE raw array crosses
      host->device (int16 when the input is 16-bit-exact — `in_i16`);
      scale normalization, the VAD mask (fractal.py:1074-1079 semantics),
      the reflect range padding (fractal.py:1095-1097) and the range reshape
      all happen on device; fn(raw (nb,), n_samples, n_ranges, n_domains,
      energy_thresh_RAW_scale).

    Two output protocols (static `pack`):

    - pack="full": (4, mb) float32 [idx, s, o, err-with-sym-sign-bit] — the
      complete match table (collect_packed_matches).
    - pack="idx": (mb,) int32 — -1 sentinel, else domain index (bits 0..23)
      | mirror flag (bit 24). s/o/err are recomputed HOST-side with the
      exact f32 refit against the serialized bank (ops.affine.refit_host +
      collect_idx_matches): only the selection crosses the slow
      device->host path, and the stored parameters are exactly consistent
      with the stored bank.

    The domain bank is built on-device for searching but NOT returned —
    the host rebuilds it independently (ops.domains.build_domains_host) for
    serialization, because the device->host path is orders of magnitude
    slower than host compute for bank-sized payloads."""
    n = range_size
    mb = lb // n
    dblk = _pow2_divisor(db, domain_block)
    rblk = _pow2_divisor(mb, range_block)
    assert pack in ("full", "idx")
    if device_vad:
        assert pack == "idx", "device_vad implies the idx output protocol"

    def run_search(ranges, bank, d_valid):
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
        return tuple(x.reshape(mb) for x in outs)

    def pack_out(ranges, idx, s, o, sym, err, n_ranges, energy_thresh_n):
        # sentinels: energy-pruned (fast_mode, 0.75*thresh on mean power —
        # fractal.py:602) and bucket-pad rows
        r_pow = jnp.mean(ranges * ranges, axis=1)
        r_valid = jnp.arange(mb, dtype=jnp.int32) < n_ranges
        silent = (r_pow < energy_thresh_n * 0.75) if fast_mode else jnp.zeros(mb, bool)
        dead = silent | ~r_valid | ~jnp.isfinite(err)
        if pack == "idx":
            code = idx + (sym.astype(jnp.int32) << 24)
            return jnp.where(dead, -1, code).astype(jnp.int32)
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

    if not device_vad:
        def core(weighted, raw, n_samples, n_ranges, n_domains, energy_thresh):
            bank = build_bank_jax(
                raw, tile_size, range_size, domain_step, db, n_domains
            )
            d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
            ranges = weighted.reshape(mb, n)
            idx, s, o, sym, err = run_search(ranges, bank, d_valid)
            return pack_out(ranges, idx, s, o, sym, err, n_ranges, energy_thresh)

        return core

    from ..ops.vad import voiced_mask_jax

    def core(raw, n_samples, n_ranges, n_domains, energy_thresh):
        rawf = raw.astype(jnp.float32) if in_i16 else raw
        # scale normalization on device (see compress_audio_arrays notes):
        # float32 search arithmetic near unit range keeps squared terms
        # well-conditioned; s is scale-invariant and o/err are refit on the
        # host at raw scale, so inv never leaves the device.
        scale = jnp.max(jnp.abs(rawf))
        inv = jnp.where(scale > 0, 1.0 / scale, 1.0)
        ns = jnp.asarray(n_samples, jnp.int32)
        mask = voiced_mask_jax(rawf, ns, 2 * n, energy_thresh)
        weighted = rawf * (mask.astype(jnp.float32) * inv)
        if lb <= nb:
            base = weighted[:lb]
        else:
            base = jnp.concatenate([weighted, jnp.zeros(lb - nb, jnp.float32)])
        ranges = base.reshape(mb, n)
        # reflect-pad the tail range (np.pad(..., 'reflect') parity,
        # fractal.py:1095-1097): position p >= ns reads sample 2*ns-2-p
        last = jnp.maximum(ns - 1, 0) // n
        tpos = last * n + jnp.arange(n, dtype=jnp.int32)
        refl = jnp.where(tpos < ns, tpos, 2 * ns - 2 - tpos)
        tail = jnp.take(weighted, jnp.clip(refl, 0, nb - 1), axis=0)
        need_tail = (ns % n) != 0
        ranges = jnp.where(
            ((jnp.arange(mb, dtype=jnp.int32) == last) & need_tail)[:, None],
            tail[None, :],
            ranges,
        )
        bank = build_bank_jax(
            rawf * inv, tile_size, range_size, domain_step, db, n_domains
        )
        d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
        idx, s, o, sym, err = run_search(ranges, bank, d_valid)
        return pack_out(
            ranges, idx, s, o, sym, err, n_ranges, energy_thresh * inv * inv
        )

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
        return _compress_shard(
            signal, cfg, _weighted_override, _defer_d2h, original_len
        )

    # ---- default single-shot path: device-side VAD, idx-only D2H --------
    n_ranges = -(-original_len // range_size) if original_len else 0
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

    nb = bucket(original_len, 4096)
    # bucket the RANGE COUNT, not the sample count: lb must be an exact
    # multiple of range_size for the (mb, N) reshape (range_size can have
    # odd factors, e.g. tile_size=1536 -> range_size=6)
    lb = bucket(n_ranges, 256) * range_size
    db = bucket(n_domains, 256)

    # 16-bit PCM content (every real 8/16-bit WAV) crosses host->device as
    # int16 — half the bytes of float32 on the link that costs ~50 MB/s
    # through tunneled transports; the device casts back to f32 exactly.
    peak = float(np.max(np.abs(signal)))
    in_i16 = False
    if np.isfinite(peak) and peak <= 32767.0:
        as_i16 = signal.astype(np.int16)
        in_i16 = bool(np.array_equal(signal, as_i16))
    raw_p = np.zeros(nb, dtype=np.int16 if in_i16 else np.float32)
    raw_p[:original_len] = as_i16 if in_i16 else signal

    search_mode, stride = _resolve_search(cfg, range_size, db)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    core = _encode_core(
        nb, lb, db, cfg.tile_size, range_size, domain_step, search_mode,
        cfg.top_k, cfg.emb_dim, cfg.fast_mode, cfg.s_clip, cfg.domain_block,
        cfg.range_block, cfg.objective, stride, cfg.coarse_topc,
        bool(use_pallas), True, "idx", in_i16,
    )

    # single-core hosts (tunnel rigs): the tunnel client shares the CPU with
    # numpy, so NOTHING runs between dispatch and fetch — the fetch thread
    # blocks in C with the GIL released and the transport pumps at full
    # speed; all host work happens after.
    with DEVICE_LOCK, phase("device"):
        codes = core(
            jnp.asarray(raw_p),
            jnp.int32(original_len),
            jnp.int32(n_ranges),
            jnp.int32(n_domains),
            jnp.float32(cfg.energy_thresh),
        )
        with phase("d2h"):
            c = np.asarray(jax.device_get(codes))[:n_ranges]

    # serialized bank rebuilt host-side (cumsum box means) — cheaper than
    # pulling it over the device->host link
    with phase("host_bank"):
        bank = build_domains_host(signal, cfg.tile_size, range_size, domain_step)
    assert len(bank) == n_domains

    pad_len = (range_size - (original_len % range_size)) % range_size
    if cfg.fast_mode and bool(np.all(c < 0)):
        # every range pruned: distinguish the reference's all-silent empty
        # container (fractal.py:1083-1093) from an all-sentinel file — only
        # here is the host VAD pass actually needed
        with phase("vad"):
            voiced = voiced_detection(
                signal, frame_size=range_size * 2,
                energy_threshold=cfg.energy_thresh,
            )
        if float(np.sum((signal * voiced).astype(np.float64) ** 2)) < 1e-8:
            return _empty_result(
                range_size, cfg.tile_size, domain_step, cfg.energy_thresh,
                original_len, arrays=True,
            )
        ranges_host = None  # all sentinels: no refit targets needed
    elif cfg.fast_mode:
        # refit against the RAW ranges: the VAD frame (2*range_size) aligns
        # with range boundaries, so every range is either fully voiced
        # (weighted == raw on it) or fully zeroed (device emitted a sentinel
        # — its refit row is ignored). The host VAD pass is skipped
        # entirely on this, the common, path.
        if pad_len:
            padded = np.pad(signal, (0, pad_len), mode="reflect")
        else:
            padded = signal
        ranges_host = padded.reshape(n_ranges, range_size)
    else:
        # fast_mode=False keeps live matches for sub-threshold ranges, whose
        # content IS the weighted signal — the VAD pass is load-bearing
        with phase("vad"):
            voiced = voiced_detection(
                signal, frame_size=range_size * 2,
                energy_threshold=cfg.energy_thresh,
            )
            weighted = signal * voiced
        if float(np.sum(weighted.astype(np.float64) ** 2)) < 1e-8:
            return _empty_result(
                range_size, cfg.tile_size, domain_step, cfg.energy_thresh,
                original_len, arrays=True,
            )
        if pad_len:
            weighted = np.pad(weighted, (0, pad_len), mode="reflect")
        ranges_host = weighted.reshape(n_ranges, range_size)

    with phase("refit"):
        rec = collect_idx_matches(c, n_ranges, ranges_host, bank, cfg.s_clip)

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


def _resolve_search(cfg: EncoderConfig, range_size: int, db: int):
    """Resolve search mode + coarse stride for a bucketed bank size: coarse
    pays off once the bank dwarfs the refine windows; the stride must stay
    well under the box-mean width."""
    block_len = cfg.tile_size // range_size
    stride = min(cfg.coarse_stride, max(1, block_len // 4))
    stride = 1 << (stride.bit_length() - 1)  # largest pow2 <= stride
    search_mode = cfg.search
    if search_mode == "auto":
        search_mode = (
            "coarse"
            if db >= max(cfg.auto_coarse_threshold, 256 * stride) and stride > 1
            else "exact"
        )
    return search_mode, stride


def _compress_shard(signal, cfg: EncoderConfig, weighted, defer_d2h, original_len):
    """Streaming shard mode (models.stream): the caller already ran the
    global VAD + padding; `signal` is the shard's domain-search window and
    the returned bank is None (serialized separately). Host-side scale
    normalization + the full packed output protocol."""
    range_size = cfg.range_size
    domain_step = cfg.domain_step
    weighted = np.ascontiguousarray(weighted, dtype=np.float32)
    assert len(weighted) % range_size == 0
    n_ranges = len(weighted) // range_size

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

    # Scale normalization: float32 search arithmetic on raw PCM amplitudes
    # (~3e4) loses ~7 significant digits on squared terms; working near unit
    # scale keeps the selection scores and refit well-conditioned. s is
    # scale-invariant; o/err are rescaled on the way out.
    scale = float(np.max(np.abs(signal))) or 1.0
    inv = np.float32(1.0 / scale)
    nb = bucket(original_len, 4096)
    lb = bucket(n_ranges, 256) * range_size
    db = bucket(n_domains, 256)
    raw_p = np.zeros(nb, dtype=np.float32)
    raw_p[:original_len] = signal
    raw_p *= inv
    wtd_p = np.zeros(lb, dtype=np.float32)
    wtd_p[: len(weighted)] = weighted
    wtd_p *= inv

    search_mode, stride = _resolve_search(cfg, range_size, db)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    core = _encode_core(
        nb, lb, db, cfg.tile_size, range_size, domain_step, search_mode,
        cfg.top_k, cfg.emb_dim, cfg.fast_mode, cfg.s_clip, cfg.domain_block,
        cfg.range_block, cfg.objective, stride, cfg.coarse_topc,
        bool(use_pallas), False, "full", False,
    )
    args = (
        jnp.asarray(wtd_p),
        jnp.asarray(raw_p),
        jnp.int32(original_len),
        jnp.int32(n_ranges),
        jnp.int32(n_domains),
        jnp.float32(cfg.energy_thresh / (scale * scale)),
    )
    if defer_d2h:
        # streaming pipeline mode (models.stream): the CALLER holds
        # DEVICE_LOCK, dispatches the next shard before collecting this one
        # (single-threaded async overlap) and materializes the record later
        # with collect_packed_matches.
        return core(*args), scale, n_ranges

    with DEVICE_LOCK, phase("device"):
        packed = core(*args)
        with phase("d2h"):
            rec = collect_packed_matches(packed, scale, n_ranges)

    return (
        rec,
        None,
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


def collect_idx_matches(codes, n_ranges: int, ranges: np.ndarray,
                        bank: np.ndarray, s_clip: float) -> np.ndarray:
    """Device->host transfer + record materialization for the idx-only
    encode output (pack="idx"): one int32 per range — sentinel -1, else the
    selected domain index (bits 0..23) with the mirror flag in bit 24.
    s/o/err are recomputed here with the exact f32 refit against the
    SERIALIZED bank (ops.affine.refit_host), so the stored parameters are
    self-consistent with the stored bank and only ~4 bytes/range cross the
    slow device->host path (vs 16 for the full packed protocol)."""
    from ..ops.affine import refit_host

    c = np.asarray(jax.device_get(codes))[:n_ranges]
    dead = c < 0
    rec = np.empty(n_ranges, dtype=MATCH_DTYPE)
    if ranges is None or bool(np.all(dead)):
        rec["idx"] = -1
        rec["s"] = 1.0
        rec["o"] = 0.0
        rec["sym"] = 0
        rec["err"] = 0.0
        return rec
    idx = np.where(dead, 0, c & 0xFFFFFF).astype(np.int32)
    sym = np.where(dead, False, (c >> 24) != 0)
    s, o, err = refit_host(ranges, bank, idx, sym, s_clip)
    rec["idx"] = np.where(dead, -1, idx)
    rec["s"] = np.where(dead, np.float32(1.0), s)
    rec["o"] = np.where(dead, np.float32(0.0), o)
    rec["sym"] = sym.astype(np.uint8)
    rec["err"] = np.where(dead, np.float32(0.0), err)
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
