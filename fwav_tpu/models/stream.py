"""Long-file streaming encode (SURVEY.md §5 long-context, BASELINE config 3).

The reference scales to long audio with out-of-core memmaps: the domain bank
and embeddings are built blockwise into temp files and re-opened read-only by
worker processes (fractal.py:285-334, 238-280, 576-581). The TPU equivalents:

- TIME SHARDING with halos: the signal is encoded in fixed shards; each
  shard's ranges search the domains whose windows start within
  [shard_start - halo, shard_end + halo). Domain indices stay GLOBAL, so the
  emitted matches are indistinguishable from a whole-file encode restricted
  to a local search neighborhood. This bounds HBM and compile shapes
  regardless of duration, and is the same decomposition a multi-chip
  time-axis sharding uses (each chip takes shards; the halo is the
  CP/halo-exchange analog — SURVEY.md §2.5).
- BLOCKWISE host bank generation: the serialized bank is produced block by
  block from local cumulative sums (domain_block_iter), so a multi-GB bank
  streams straight into the .fwav without materializing.

Locality note: the reference searches every domain for every range; a halo
search is a neighborhood restriction. Audio self-similarity is strongly
local, and the balanced objective needs only *a* well-fitting small-|s*mean|
domain, so round-trip SNR is unaffected (tested); the default halo spans
hundreds of thousands of candidate domains either side.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import EncoderConfig
from ..io.container import MATCH_DTYPE
from ..ops.domains import n_domains_for
from ..ops.vad import voiced_detection
from .encode import compress_audio_arrays

#: Encode shard length in samples (~24 s at 44.1 kHz); must stay well under
#: the bucket grid's comfort zone so every shard reuses one compiled program.
DEFAULT_SHARD = 1 << 20
#: Extra signal (samples) visible to each shard's domain search on each side.
DEFAULT_HALO = 1 << 18


def domain_block_iter(signal, tile_size, range_size, domain_step, block_rows=65536):
    """Yield the (D, range_size) bank in row blocks via ops.domains'
    shared box-mean builder (local cumulative sums — O(block) memory for
    any file length)."""
    from ..ops.domains import bank_rows_host

    signal = np.asarray(signal, dtype=np.float32)
    d = n_domains_for(len(signal), tile_size, domain_step)
    for i0 in range(0, d, block_rows):
        rows = np.arange(i0, min(i0 + block_rows, d), dtype=np.int64)
        yield bank_rows_host(signal, tile_size, range_size, domain_step, rows)


#: Reference-API kwargs that are no-ops on TPU (accepted for parity, same
#: as compress_audio_arrays).
_IGNORED_KWARGS = frozenset({
    "ef_search", "use_gpu", "domains_tmpdir", "batch_size_gpu",
    "batch_size_cpu", "transient_weight", "n_mels", "cpu_workers",
})


def compress_audio_streaming(
    signal,
    framerate,
    sampwidth,
    shard_samples: int = DEFAULT_SHARD,
    halo: int = DEFAULT_HALO,
    resume_dir=None,
    **kwargs,
):
    """Shard-by-shard encode for long files. Same return contract as
    compress_audio_arrays, except `domains` is returned as None — callers
    serialize the bank with domain_block_iter (models.codec does this
    automatically). Matches carry global domain indices.

    Encoder knobs (tile_size, energy_thresh, fast_mode, search, objective,
    top_k, emb_dim, ...) are forwarded into EncoderConfig; unknown kwargs
    raise instead of silently changing semantics by file length.

    resume_dir: chunk-level checkpointing (SURVEY.md §5) — each completed
    shard's match records are persisted there and skipped on re-run, so a
    crashed multi-hour encode resumes at the last finished shard (the
    analog of the CLI's file-level skip-resume, one level finer)."""
    cfg = kwargs.pop("config", None)
    if cfg is None:
        fields = {f.name for f in dataclasses.fields(EncoderConfig)}
        cfg_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in fields}
        cfg = EncoderConfig(**cfg_kwargs)
    for k in _IGNORED_KWARGS:
        kwargs.pop(k, None)
    if kwargs:
        raise TypeError(f"unknown compress kwargs: {sorted(kwargs)}")
    range_size = cfg.range_size
    step = cfg.domain_step

    signal = np.ascontiguousarray(np.asarray(signal, dtype=np.float32))
    original_len = len(signal)
    n_domains = n_domains_for(original_len, cfg.tile_size, step)

    # global prepass: VAD + scale, so shard boundaries don't shift decisions
    voiced = voiced_detection(
        signal, frame_size=2 * range_size, energy_threshold=cfg.energy_thresh
    )
    weighted = signal * voiced
    if float(np.sum(weighted.astype(np.float64) ** 2)) < 1e-8:
        # all-silent early return, same shape as the short-file path
        # (fractal.py:1083-1093): empty matches, n_ranges=0 — not a file
        # full of sentinel records
        from .encode import _empty_result

        return _empty_result(
            range_size, cfg.tile_size, step, cfg.energy_thresh,
            original_len, arrays=True,
        )
    pad_len = (range_size - (original_len % range_size)) % range_size
    if pad_len:
        weighted = np.pad(weighted, (0, pad_len), mode="reflect")
    L = len(weighted)
    n_ranges = L // range_size

    shard_samples = max(range_size, (shard_samples // range_size) * range_size)
    bounds = [
        (a, min(L, a + shard_samples)) for a in range(0, L, shard_samples)
    ]
    slots = [None] * len(bounds)

    from .encode import DEVICE_LOCK, collect_packed_matches

    def _collect(pending):
        k, packed, scale, g0 = pending
        with DEVICE_LOCK:
            rec = collect_packed_matches(
                packed, scale, (bounds[k][1] - bounds[k][0]) // range_size
            )
        live = rec["idx"] >= 0
        rec["idx"][live] += g0 // step
        slots[k] = rec
        if resume_dir:
            np.save(_ckpt(k), rec)

    # one-deep pipeline: dispatch shard k+1 before pulling shard k's results,
    # so the device computes while the host waits on the (slow) D2H path.
    # DEVICE_LOCK is held PER dispatch / collect, not for the whole file, so
    # batch worker threads encoding short files interleave with a multi-hour
    # streaming encode instead of starving behind it.
    import os

    def _ckpt(k):
        return os.path.join(resume_dir, f"shard_{k:06d}.npy") if resume_dir else None

    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    pending = None
    for k, (a, b) in enumerate(bounds):
        if resume_dir and os.path.exists(_ckpt(k)):
            rec = np.load(_ckpt(k))
            if rec.dtype == MATCH_DTYPE and len(rec) == (b - a) // range_size:
                slots[k] = rec
                continue  # resume: shard already encoded
        # domain neighborhood: windows starting in [g0, g1), g0 step-aligned
        g0 = (max(0, a - halo) // step) * step
        g1 = min(original_len, b + halo)
        raw_window = signal[g0:g1]
        if n_domains_for(len(raw_window), cfg.tile_size, step) == 0:
            # shard past the end of usable signal: emit sentinels
            m = (b - a) // range_size
            rec = np.zeros(m, dtype=MATCH_DTYPE)
            rec["idx"] = -1
            rec["s"] = 1.0
            slots[k] = rec
            continue

        with DEVICE_LOCK:
            packed, scale, m = compress_audio_arrays(
                raw_window,
                framerate,
                sampwidth,
                config=cfg,
                _weighted_override=weighted[a:b],
                _defer_d2h=True,
            )
        assert m == (b - a) // range_size
        if pending is not None:
            _collect(pending)
        pending = (k, packed, scale, g0)
    if pending is not None:
        _collect(pending)

    rec = np.concatenate(slots) if slots else np.empty(0, dtype=MATCH_DTYPE)
    assert len(rec) == n_ranges, (len(rec), n_ranges)
    return (
        rec,
        None,
        n_ranges,
        range_size,
        cfg.tile_size,
        step,
        cfg.energy_thresh,
        original_len,
    )
