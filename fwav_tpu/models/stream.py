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

Transfers use the same lean protocols as the single-shot path
(models.encode): the raw window crosses host->device as int16 when the
content is 16-bit-exact, the GLOBAL host VAD decisions ride along as packed
per-sample bits (mode="masked" — hysteresis state carries from t=0, so
per-shard device VAD would diverge near shard starts), and only 3 bytes per
range come back; s/o/err/orientation are refit on the host against the
exact serialized bank rows.

Locality note: the reference searches every domain for every range; a halo
search is a neighborhood restriction. Audio self-similarity is strongly
local, and the balanced objective needs only *a* well-fitting small-|s*mean|
domain, so round-trip SNR is unaffected (tested); the default halo spans
hundreds of thousands of candidate domains either side.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from ..io.container import MATCH_DTYPE
from ..ops.domains import n_domains_for
from ..ops.vad import voiced_detection
from ..utils.buckets import bucket, pad_to
from ..utils.logging import logger
from ..utils.trace import phase
from .encode import (
    DEVICE_LOCK,
    _as_i16_or_f32,
    _core_key,
    _encode_core,
    _range_split_factor,
    _sharded_encode_core,
)

#: Encode shard length in samples (~24 s at 44.1 kHz); must stay well under
#: the bucket grid's comfort zone so every shard reuses one compiled program.
DEFAULT_SHARD = 1 << 20
#: Extra signal (samples) visible to each shard's domain search on each side.
DEFAULT_HALO = 1 << 18


#: Whole-file banks above this many rows (~1.7 h of 44.1 kHz at step 1;
#: 4.3 GiB of HBM) skip the global pass instead of risking the device's
#: memory — quality falls back to the halo-local search.
GLOBAL_PASS_MAX_ROWS = 1 << 28
#: Cap on the nomination grid (subsampled bank rows): the scan costs
#: O(n_ranges * d_total / stride) — quadratic in duration at fixed
#: stride — so beyond this the stride doubles (see _global_pass).
GLOBAL_NOM_ROWS = 1 << 16


def _global_pass(rec, signal, weighted, raw_src, voiced_p, cfg,
                 original_len, in_i16):
    """Whole-file global-candidate pass (VERDICT r3 item 5).

    The time-sharded encoder restricts each shard's search to its halo
    window; on content whose self-similarity is NOT local, the clip-aware
    "damped" objective starves (31.4 dB vs the 40.2 dB whole-file oracle on
    the 100 s bench fixture — the reference searches the full bank for
    every range, fractal.py:556-632). Recovery, measured at 38.6 dB: ONE
    extra device dispatch (models.encode build_encode_core mode="global")
    that nominates top-C whole-file windows per range on the
    stride-subsampled bank, refines each at full resolution, and compares
    against the shard-local winner on device — only winning indices cross
    D2H (int32), and this host refits them against the serialized bank
    rows, so the exact-refit invariant holds and the host does no merge
    math at all (an earlier host-merge design cost ~27 s per 100 s file on
    a 1-core host). The dispatch runs unsharded even under a mesh: one
    replicated program keeps records identical across (dp, tp).

    Mutates and returns `rec`.
    """
    from ..ops.affine import refit_host
    from ..ops.domains import bank_rows_host

    n = cfg.range_size
    tile, step = cfg.tile_size, cfg.domain_step
    stride = cfg.global_stride
    d_total = n_domains_for(original_len, tile, step)
    if d_total <= 2 * stride:
        return rec  # the subsampled grid would be degenerate
    if d_total > GLOBAL_PASS_MAX_ROWS:
        logger.warning(
            "Global-candidate pass skipped: %d bank rows exceed the "
            "whole-file device budget (%d); quality falls back to the "
            "halo-local search", d_total, GLOBAL_PASS_MAX_ROWS,
        )
        return rec
    # long-file cost valve: the nomination scan is O(n_ranges * d_total /
    # stride) — quadratic in duration at a fixed stride — so double the
    # stride until the grid fits GLOBAL_NOM_ROWS (~25 min of 44.1 kHz at
    # the default). Quality is nearly flat in the stride because the
    # refine window W = 1.25*stride widens with it (measured on the 100 s
    # fixture: stride 512 -> 38.57 dB, 1024 -> 37.63, 2048 -> 37.91).
    while -(-d_total // stride) > GLOBAL_NOM_ROWS:
        stride *= 2
    if stride != cfg.global_stride:
        logger.info(
            "Global-candidate pass: nomination stride %d -> %d for %d "
            "bank rows", cfg.global_stride, stride, d_total,
        )
        cfg = dataclasses.replace(cfg, global_stride=stride)

    L = len(raw_src)
    m = L // n
    assert m == len(rec)
    lb = bucket(m, 256) * n
    # db must divide by the nomination stride; bucketing the SUBSAMPLED
    # row count keeps a healthy power-of-two block factor for the scan
    dc = bucket(-(-d_total // stride), 16)
    db = dc * stride
    nb = bucket(max(L, lb), 4096)

    raw_p = np.zeros(nb, dtype=raw_src.dtype)
    raw_p[:L] = raw_src
    vbits = np.zeros(nb, np.uint8)
    vbits[:L] = voiced_p
    mask_bytes = np.packbits(vbits, bitorder="little")
    meta = np.array([L, 0, m, d_total], np.int32)
    lrows32 = np.full(lb // n, -1, np.int32)
    lrows32[:m] = rec["idx"]
    from . import encode as _encode_mod

    pack3 = db < _encode_mod.PACK3_MAX_ROWS  # mirrors the core's switch
    lrows = _encode_mod.pack3_np(lrows32) if pack3 else lrows32

    key = _core_key(cfg, nb, lb, db, "global", in_i16)
    core = _encode_core(*key)
    # lock per dispatch and per fetch (not across both), like the shard
    # loop: a concurrent batch thread's short encode can enqueue behind
    # the pass instead of waiting out its whole device time + D2H.
    # Sub-phases split tunnel transport from device compute: "global_h2d"
    # blocks on the puts, "global_dispatch" is trace+enqueue, and
    # "global_fetch" is device execute + D2H (collect_phases sums them
    # into the global_pass total for callers that only read that).
    with DEVICE_LOCK, phase("global_pass"):
        with phase("global_h2d"):
            args_dev = [
                jax.device_put(x)
                for x in (raw_p, mask_bytes, meta, lrows)
            ]
            jax.block_until_ready(args_dev)
        with phase("global_dispatch"):
            out_dev = core(*args_dev)
    with DEVICE_LOCK, phase("global_pass"):
        from ..parallel.mesh import fetch_global

        with phase("global_fetch"):
            out = fetch_global(out_dev)[:m]
    winners = _encode_mod.unpack3_np(out) if pack3 else out

    imp = winners >= 0
    # observability parity with the reference's convergence/coverage INFO
    # logs (fractal.py:1464-1466 family)
    logger.info(
        "Global-candidate pass: %d/%d ranges improved",
        int(imp.sum()), int((rec["idx"] >= 0).sum()),
    )
    if not imp.any():
        return rec
    rows = winners[imp].astype(np.int64)
    tiles = bank_rows_host(signal, tile, n, step, rows)
    s, o, err, sym = refit_host(
        np.ascontiguousarray(weighted.reshape(-1, n)[imp]), tiles,
        np.arange(len(rows), dtype=np.int32), cfg.s_clip,
    )
    rec["idx"][imp] = winners[imp]
    rec["s"][imp] = s
    rec["o"][imp] = o
    rec["sym"][imp] = sym
    rec["err"][imp] = err
    return rec


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
    mesh=None,
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
    analog of the CLI's file-level skip-resume, one level finer).
    Checkpoints live under a subdirectory named by a fingerprint of the
    signal content and every record-affecting encode parameter, so one
    resume_dir is safe to share across concurrent --batch files and across
    reruns with changed inputs or settings (each combination resumes only
    its own shards).

    mesh: a (dp, tp) jax.sharding.Mesh composes TIME sharding with the
    multi-chip shardings (SURVEY.md §2.5 SP/CP + DP/TP): every time shard's
    dispatch runs the production core under shard_map — its ranges split
    over the dp axis, its domain window tensor-sharded over tp — and the
    one-deep shard pipeline still applies. Records are BIT-EQUAL to the
    single-device streaming encode (host refit of device selections;
    tests/test_stream_sharded.py)."""
    cfg = kwargs.pop("config", None)
    if cfg is None:
        fields = {f.name for f in dataclasses.fields(EncoderConfig)}
        cfg_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in fields}
        cfg = EncoderConfig(**cfg_kwargs)
    for k in _IGNORED_KWARGS:
        kwargs.pop(k, None)
    if kwargs:
        raise TypeError(f"unknown compress kwargs: {sorted(kwargs)}")
    n = cfg.range_size
    step = cfg.domain_step
    tile = cfg.tile_size

    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.mesh import DP_AXIS, TP_AXIS

        dp, tp = mesh.shape[DP_AXIS], mesh.shape[TP_AXIS]
    else:
        mesh, dp, tp = None, 1, 1

    signal = np.ascontiguousarray(np.asarray(signal, dtype=np.float32))
    original_len = len(signal)

    # global prepass: VAD + silence check, so shard boundaries don't shift
    # decisions (hysteresis state carries from t=0 — fractal.py:897-907)
    with phase("vad"):
        voiced = voiced_detection(
            signal, frame_size=2 * n, energy_threshold=cfg.energy_thresh
        )
    weighted = signal * voiced
    if float(np.sum(weighted.astype(np.float64) ** 2)) < 1e-8:
        # all-silent early return, same shape as the short-file path
        # (fractal.py:1083-1093): empty matches, n_ranges=0 — not a file
        # full of sentinel records
        from .encode import _empty_result

        return _empty_result(
            n, tile, step, cfg.energy_thresh, original_len, arrays=True,
        )
    pad_len = (n - (original_len % n)) % n
    if pad_len:
        # reflect distributes over the signal*mask product, so padding raw
        # and mask separately reproduces np.pad(weighted, 'reflect') exactly
        signal_p = np.pad(signal, (0, pad_len), mode="reflect")
        voiced_p = np.pad(voiced, (0, pad_len), mode="reflect")
        weighted = np.pad(weighted, (0, pad_len), mode="reflect")
    else:
        signal_p, voiced_p = signal, voiced
    L = len(weighted)
    n_ranges = L // n

    # 16-bit-exact content ships as int16 (half the host->device bytes);
    # the probe is models.encode's shared transport rule
    raw_src, in_i16 = _as_i16_or_f32(signal_p)

    shard_samples = max(n, (shard_samples // n) * n)
    bounds = [(a, min(L, a + shard_samples)) for a in range(0, L, shard_samples)]
    slots = [None] * len(bounds)

    if resume_dir:
        # Namespace checkpoints by input identity + every encode parameter
        # that can change the emitted records: a shared --resume-dir across
        # a --batch run (or a rerun on different content / settings) must
        # NEVER serve another encode's shards — shard index + length alone
        # cannot distinguish them (every full shard has the same length).
        import hashlib

        h = hashlib.sha256()
        # (dp, tp) stays in the fingerprint as defense in depth: every
        # (dp, tp) is bit-equal by design since round 4, but splicing
        # checkpoints across configurations would silently mask any future
        # regression of that property. "shapes-v2" is the unified-bucket
        # schema token: selections are deterministic per compiled slab
        # shape, so checkpoints written by a different shape schema must
        # re-encode rather than splice.
        h.update(
            repr(("shapes-v2", original_len, shard_samples, halo, dp, tp, cfg))
            .encode()
        )
        h.update(signal.tobytes())
        resume_dir = os.path.join(resume_dir, h.hexdigest()[:24])
        os.makedirs(resume_dir, exist_ok=True)

    def _ckpt(k):
        return os.path.join(resume_dir, f"shard_{k:06d}.npy") if resume_dir else None

    def _spawn_fetcher(codes):
        # fetch from a thread that blocks in C (GIL released): the host
        # refit/checkpoint/next-shard prep below then overlap the fetch
        # window instead of starving the tunnel client ~1:1 (CLAUDE.md
        # invariant; same pattern as models.encode._compress_fast).
        # DEVICE_LOCK inside the thread keeps the no-concurrent-dispatch
        # rule: the next dispatch waits until this fetch drains.
        import threading

        box: dict = {}

        def run():
            try:
                with DEVICE_LOCK:
                    from ..parallel.mesh import fetch_global

                    box["codes"] = fetch_global(codes)
            except BaseException as e:  # surfaced at join
                box["exc"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t, box

    def _collect(pending):
        k, fetcher, box, a, b, g0 = pending
        m = (b - a) // n
        with phase("fetch_wait"):
            fetcher.join()
        if "exc" in box:
            raise box["exc"]
        b3 = box["codes"][:m].astype(np.int32)
        with phase("host_refit"):
            slots[k] = rec = _refit_shard(
                b3, signal, weighted[a:b].reshape(m, n), g0 // step, tile, n,
                step, cfg.s_clip,
            )
        if resume_dir:
            # crash-safe: write-to-temp + atomic rename, so a kill mid-save
            # never leaves a truncated checkpoint that poisons every later
            # resume attempt
            tmp = _ckpt(k) + ".tmp"
            with open(tmp, "wb") as f:  # np.save(path) would append .npy
                np.save(f, rec)
            os.replace(tmp, _ckpt(k))

    # TWO-DEEP pipeline (VERDICT r2 item 7): shard k's FETCHER is spawned
    # only after shard k+1's dispatch is enqueued, so the device computes
    # shard k+1 while the tunnel drains shard k's results — under the same
    # lock discipline (every dispatch and every fetch still holds
    # DEVICE_LOCK exclusively; nothing runs concurrently on the tunnel,
    # the queue is just two shards deep). Shard k-1's host refit/checkpoint
    # overlap shard k's fetch window as before. DEVICE_LOCK is held PER
    # dispatch / fetch, not for the whole file, so batch worker threads
    # encoding short files interleave with a multi-hour streaming encode
    # instead of starving behind it.
    dispatched = None  # (k, codes, a, b, g0): enqueued, fetcher not started
    fetching = None    # (k, fetcher, box, a, b, g0): D2H in flight

    # ONE compiled program per streaming encode (round-4, VERDICT r3 weak
    # item 6): the first shard (no left halo) and the tail shard (short)
    # would otherwise land in their own shape buckets, and on tunneled
    # hardware every extra compile costs 1.5-8 min cold (the PJRT plugin
    # cannot persist compiled executables — docs/ROADMAP.md). Unify every
    # dispatching shard onto the maximal bucket: per-shard meta still
    # carries the true (lenw, offset, m, n_domains), so padded rows are
    # masked exactly as before. Cost: zero-fill + edge-shard over-compute
    # and one full-size tail D2H — noise next to a saved compile.
    geo = []
    for a, b in bounds:
        g0 = (max(0, a - halo) // step) * step
        g1 = min(original_len, b + halo)
        g1p = min(L, b + halo)
        geo.append(
            (g0, (b - a) // n, n_domains_for(g1 - g0, tile, step), g1p - g0,
             a - g0)
        )
    live_geo = [g for g in geo if g[2] > 0]
    if live_geo:
        rbw = bucket(max(g[1] for g in live_geo), 256)
        dbw = bucket(max(g[2] for g in live_geo), 256)
        db = pad_to(dbw, tp * 256) if tp > 1 else dbw
        rsplit = _range_split_factor(cfg, n, db, dp, tp)
        lb = (pad_to(rbw, rsplit * 256) if rsplit > 1 else rbw) * n
        nbw = bucket(
            max(max(g[3] for g in live_geo),
                max(g[4] for g in live_geo) + lb),
            4096,
        )

    def _advance(next_dispatched):
        nonlocal dispatched, fetching
        if dispatched is not None:
            k0, codes0, a0, b0, g00 = dispatched
            fetcher, box = _spawn_fetcher(codes0)
            if fetching is not None:
                _collect(fetching)
            fetching = (k0, fetcher, box, a0, b0, g00)
        dispatched = next_dispatched

    for k, (a, b) in enumerate(bounds):
        if resume_dir and os.path.exists(_ckpt(k)):
            try:
                rec = np.load(_ckpt(k))
            except Exception:  # corrupt/foreign checkpoint -> re-encode
                rec = None
            if (
                rec is not None and rec.dtype == MATCH_DTYPE
                and len(rec) == (b - a) // n
            ):
                slots[k] = rec
                continue  # resume: shard already encoded
        # domain neighborhood: windows starting in [g0, g1), g0 step-aligned
        g0, m, n_dom_w, lenw, _off = geo[k]
        if n_dom_w == 0:
            # shard past the end of usable signal: emit sentinels
            rec = np.zeros(m, dtype=MATCH_DTYPE)
            rec["idx"] = -1
            rec["s"] = 1.0
            slots[k] = rec
            continue
        if n_dom_w >= 1 << 24:
            raise ValueError(
                f"{n_dom_w} domains in one shard window exceeds the 2^24 "
                "index range; lower shard_samples/halo"
            )

        g1p = min(L, b + halo)  # padded window end (samples)
        # shared unified bucket sizes (rbw/db/lb/nbw precomputed above);
        # shard-divisibility padding only on real meshes (see
        # models/encode.py: pad_to at dp=1/tp=1 would undo the
        # quarter-octave buckets' small-shape padding cap); coarse's tp
        # sharding splits the RANGE axis (encode._range_split_factor)
        raw_p = np.zeros(nbw, dtype=raw_src.dtype)
        raw_p[:lenw] = raw_src[g0:g1p]
        vbits = np.zeros(nbw, np.uint8)
        vbits[:lenw] = voiced_p[g0:g1p]
        mask_bytes = np.packbits(vbits, bitorder="little")
        meta = np.array([lenw, a - g0, m, n_dom_w], np.int32)

        # shared cache-key builder (also runs the tp-composition check)
        key = _core_key(cfg, nbw, lb, db, "masked", in_i16, tp)
        if mesh is not None:
            from ..parallel.mesh import DP_AXIS, TP_AXIS

            core = _sharded_encode_core(
                mesh, DP_AXIS, 3, *key, dp, tp, DP_AXIS, TP_AXIS
            )
        else:
            core = _encode_core(*key)
        with DEVICE_LOCK, phase("dispatch"):
            codes = core(
                jnp.asarray(raw_p), jnp.asarray(mask_bytes), jnp.asarray(meta)
            )
        _advance((k, codes, a, b, g0))
    _advance(None)  # start the last shard's fetch
    if fetching is not None:
        _collect(fetching)

    rec = np.concatenate(slots) if slots else np.empty(0, dtype=MATCH_DTYPE)
    assert len(rec) == n_ranges, (len(rec), n_ranges)
    # global-candidate pass (VERDICT r3 item 5): auto-on for the clip-aware
    # damped objective whenever the search is actually halo-restricted
    # (a single shard's window already spans the whole file); runs AFTER
    # every shard so the device can compare against the local winners
    gc_on = cfg.global_candidates
    if gc_on is None:
        gc_on = cfg.objective == "damped" and len(bounds) > 1
    if gc_on and live_geo and bool((rec["idx"] >= 0).any()):
        rec = _global_pass(
            rec, signal, weighted, raw_src, voiced_p, cfg, original_len,
            in_i16,
        )
    return (
        rec,
        None,
        n_ranges,
        n,
        tile,
        step,
        cfg.energy_thresh,
        original_len,
    )


def _refit_shard(b3, signal, ranges, row_base, tile, n, step, s_clip):
    """Materialize one shard's match records from its 3-byte device codes:
    decode window-local indices, shift to GLOBAL rows, rebuild exactly the
    referenced serialized-bank rows (ops.domains.bank_rows_host — the same
    box-mean math the .fwav writer streams out) and run the host refit."""
    from ..ops.affine import refit_host
    from ..ops.domains import bank_rows_host

    from .encode import unpack3_np

    m = len(b3)
    c = unpack3_np(b3)
    rec = np.empty(m, dtype=MATCH_DTYPE)
    rec["idx"] = -1
    rec["s"] = 1.0
    rec["o"] = 0.0
    rec["sym"] = 0
    rec["err"] = 0.0
    live = c >= 0
    if not live.any():
        return rec
    rows = c[live] + row_base
    bank_rows = bank_rows_host(signal, tile, n, step, rows)
    s, o, err, sym = refit_host(
        np.ascontiguousarray(ranges[live]), bank_rows,
        np.arange(len(bank_rows), dtype=np.int32), s_clip,
    )
    rec["idx"][live] = rows.astype(np.int32)
    rec["s"][live] = s
    rec["o"][live] = o
    rec["sym"][live] = sym
    rec["err"][live] = err
    return rec
