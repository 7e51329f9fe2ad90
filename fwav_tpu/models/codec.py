"""File-level compress/decompress (reference: fractal.py:1491-1546).

process_file_compress / process_file_decompress return per-file metric dicts
({'input','output','time_s','ratio'} / error dicts on failure) so batch jobs
survive bad files, exactly like the reference. Internally they use the
array fast path (no per-range Python tuples).

Output-path semantics: the reference treats its `outdir` argument strictly
as a directory, so `compress in.wav out.fwav` creates a DIRECTORY named
out.fwav (quirk, SURVEY.md §2.4.7). Here a path that ends in .fwav/.wav is
treated as the literal output file; anything else keeps the reference's
directory semantics.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..io.container import (
    load_compressed_arrays,
    save_compressed,
    save_compressed_streaming,
)
from ..io.wav import read_wav_mono, write_wav
from ..utils.logging import logger
from ..utils.metrics import compression_ratio, x_realtime
from .decode import decompress_audio
from .encode import compress_audio_arrays
from .stream import compress_audio_streaming, domain_block_iter

#: Files longer than this (samples) encode via time-sharded streaming with
#: a blockwise-serialized bank (BASELINE config 3: >=30 min files).
STREAMING_THRESHOLD = 1 << 22


def _resolve_out(path, outdir, default_suffix, expected_ext):
    if outdir is None:
        return os.path.splitext(path)[0] + default_suffix
    if outdir.lower().endswith(expected_ext):
        parent = os.path.dirname(outdir)
        if parent:
            os.makedirs(parent, exist_ok=True)
        return outdir
    os.makedirs(outdir, exist_ok=True)
    base = os.path.basename(path)
    if default_suffix == ".fwav":
        return os.path.join(outdir, base + ".fwav")
    return os.path.join(outdir, base + "_recon.wav")


def _profile_hint(kwargs):
    """The decode hint a compact/multichannel writer should store for this
    encode's keyword set: the damped profile's matches are tuned for
    s_damping=DAMPED_DECODE_DAMPING (config.py), every other profile for
    the default damping=0 decode (no hint needed)."""
    if kwargs.get("objective") == "damped":
        from ..config import DAMPED_DECODE_DAMPING

        return DAMPED_DECODE_DAMPING
    return None


def _stored_decode_hint(path):
    """The container's stored decode hint (v2 FLAG_DECODE_HINT byte; v3 via
    its first channel blob), or None — v1 is frozen and never carries one.
    Advisory: any read/parse failure returns None and lets the real loader
    raise the proper error later."""
    try:
        from ..io.container import read_version

        v = read_version(path)
        if v == 2:
            from ..io.compact import parse_decode_hint

            with open(path, "rb") as f:
                return parse_decode_hint(f.read(128))
        if v == 3:
            from ..io.multich import multi_decode_hint

            with open(path, "rb") as f:
                return multi_decode_hint(f.read())
    except (OSError, ValueError):
        return None
    return None


def process_file_compress(path, outdir=None, tile=1024, energy_thresh=1e-4,
                          use_gpu=False, prune_bank=False, search="auto",
                          devices=1, tp=1, compact=False, resume_dir=None,
                          channels="fold", **kwargs):
    """prune_bank=True drops unreferenced domain rows from the container
    (models.encode.prune_bank): the file stays format-valid for ANY decoder
    and decodes bit-identically, at a fraction of the size (the full bank is
    the reference's ~10x inflation, SURVEY.md §2.4.5).

    compact=True writes the v2 rate-focused container instead (io.compact:
    pruned fp16 bank, bit-packed selection streams — the first layout that
    actually compresses; implies prune_bank).

    devices>1 runs the encode over a (dp=devices//tp, tp) device mesh
    (parallel.shard.compress_audio_sharded — ranges data-parallel, bank
    tensor-sharded) producing bit-identical output to a single device.

    channels selects the multichannel policy (beyond the reference, which
    only ever folds — fractal.py:81-113): "fold" (default) averages to mono
    and writes the usual container; "keep" encodes every channel and writes
    the v3 multichannel container (io.multich — per-channel compact blobs;
    all channels of a short file share ONE vmapped device dispatch);
    "ms" additionally stores stereo as mid/side, shrinking correlated
    content. Mono inputs under keep/ms fall back to the normal mono path."""
    if channels not in ("fold", "keep", "ms"):
        return {
            "input": path,
            "error": f"Unknown channels mode: {channels!r}",
        }
    if channels != "fold":
        from ..io.wav import read_wav

        try:
            ch_data = read_wav(path)[0]
        except Exception as e:  # noqa: BLE001 — per-file isolation
            logger.exception("Compression failed for %s", path)
            return {"input": path, "error": str(e)}
        if ch_data.shape[1] > 1:
            return _process_file_compress_multi(
                path, outdir, tile, energy_thresh, search=search,
                devices=devices, tp=tp, mid_side=(channels == "ms"),
                **kwargs,
            )
        # mono input: keep/ms degrade to the standard mono container
    if compact:
        import functools

        from ..io.compact import save_compressed_compact

        prune_bank = True
        _save = functools.partial(
            save_compressed_compact, decode_damping=_profile_hint(kwargs)
        )
    else:
        _save = save_compressed
    try:
        start = time.time()
        signal, framerate, sampwidth = read_wav_mono(path)
        if sampwidth == 4:
            signal = np.clip(signal.astype(np.float32), -1.0, 1.0)

        if len(signal) > STREAMING_THRESHOLD:
            mesh = None
            if devices and devices > 1:
                # compose time-sharded streaming with the (dp, tp) mesh —
                # every shard dispatch runs under shard_map
                from ..parallel.mesh import make_mesh

                mesh = make_mesh(devices, dp=devices // tp, tp=tp)
            (
                rec, _, n_ranges, range_size, tile_size, domain_step,
                energy_threshold, original_len,
            ) = compress_audio_streaming(
                signal, framerate, sampwidth, tile_size=tile,
                energy_thresh=energy_thresh, search=search, mesh=mesh,
                resume_dir=resume_dir, **kwargs,
            )
            from ..ops.domains import n_domains_for

            n_domains = n_domains_for(original_len, tile_size, domain_step)
            logger.info(
                "Processed %d ranges (streaming), %d domains", n_ranges, n_domains
            )
            outpath = _resolve_out(path, outdir, ".fwav", ".fwav")
            if prune_bank:
                from ..ops.domains import bank_rows_host
                from .encode import remap_matches

                used = np.unique(rec["idx"][rec["idx"] >= 0])
                if used.size == 0:
                    # same guard as encode.prune_bank: the reference's
                    # load_compressed crashes on an n_domains=0 container
                    # (np.vstack of nothing, fractal.py:1372) — keep one
                    # zero row so all-sentinel files stay loadable
                    bank = np.zeros((1, range_size), np.float32)
                else:
                    bank = bank_rows_host(signal, tile_size, range_size,
                                          domain_step, used)
                    rec = remap_matches(rec, used)
                _save(
                    outpath, rec, bank, range_size, framerate, sampwidth,
                    tile_size, domain_step, energy_threshold, original_len,
                )
            else:
                save_compressed_streaming(
                    outpath, rec,
                    domain_block_iter(signal, tile_size, range_size, domain_step),
                    n_domains, range_size, framerate, sampwidth, tile_size,
                    domain_step, energy_threshold, original_len,
                )
        else:
            if devices and devices > 1:
                from ..parallel.mesh import make_mesh
                from ..parallel.shard import compress_audio_sharded

                mesh = make_mesh(devices, dp=devices // tp, tp=tp)
                (
                    rec, domains, n_ranges, range_size, tile_size,
                    domain_step, energy_threshold, original_len,
                ) = compress_audio_sharded(
                    signal, framerate, sampwidth, mesh=mesh, tile_size=tile,
                    energy_thresh=energy_thresh, search=search, **kwargs,
                )
            else:
                (
                    rec, domains, n_ranges, range_size, tile_size,
                    domain_step, energy_threshold, original_len,
                ) = compress_audio_arrays(
                    signal, framerate, sampwidth, tile_size=tile,
                    energy_thresh=energy_thresh, use_gpu=use_gpu,
                    search=search, **kwargs,
                )
            logger.info(
                "Processed %d ranges, domain matrix shape %s", n_ranges, domains.shape
            )
            if prune_bank:
                from .encode import prune_bank as _prune

                rec, domains = _prune(rec, domains)
                logger.info("Pruned bank to %d referenced domains", len(domains))
            outpath = _resolve_out(path, outdir, ".fwav", ".fwav")
            _save(
                outpath, rec, domains, range_size, framerate, sampwidth,
                tile_size, domain_step, energy_threshold, original_len,
            )
        elapsed = time.time() - start
        in_size = os.path.getsize(path)
        out_size = os.path.getsize(outpath)
        ratio = compression_ratio(in_size, out_size)
        xrt = x_realtime(original_len, framerate, elapsed)
        logger.info(
            "Compressed %s -> %s  time=%.2fs  ratio=%.2f  x_realtime=%.1f",
            path, outpath, elapsed, ratio, xrt,
        )
        return {
            "input": path, "output": outpath, "time_s": elapsed,
            "ratio": ratio, "x_realtime": xrt,
        }
    except Exception as e:  # noqa: BLE001 — per-file isolation, like the reference
        logger.exception("Compression failed for %s", path)
        return {"input": path, "error": str(e)}


def _process_file_compress_multi(path, outdir, tile, energy_thresh,
                                 search="auto", devices=1, tp=1,
                                 mid_side=False, **kwargs):
    """Channel-preserving compress (process_file_compress channels="keep"/
    "ms"): each channel encodes independently through the production core —
    one PACKED vmapped dispatch for all channels of a short file (same
    length means same shape bucket), per-channel streaming for long files,
    per-channel sharded encode under a (dp, tp) mesh — then the pruned
    per-channel records write as one v3 container (io.multich)."""
    from ..io.multich import (
        TRANSFORM_DIRECT,
        TRANSFORM_MS,
        ms_forward,
        save_compressed_multi,
    )
    from ..io.wav import read_wav
    from .encode import prune_bank as _prune

    try:
        start = time.time()
        ch_data, framerate, sampwidth = read_wav(path)
        if sampwidth == 4:
            ch_data = np.clip(ch_data.astype(np.float32), -1.0, 1.0)
        transform = TRANSFORM_DIRECT
        if mid_side:
            if ch_data.shape[1] != 2:
                raise ValueError(
                    "channels='ms' requires stereo input "
                    f"({ch_data.shape[1]} channels found)"
                )
            ch_data = ms_forward(ch_data)
            transform = TRANSFORM_MS
        signals = [np.ascontiguousarray(ch_data[:, c])
                   for c in range(ch_data.shape[1])]

        if len(signals[0]) > STREAMING_THRESHOLD:
            encoded = [
                _streamed_pruned(sig, framerate, sampwidth, tile,
                                 energy_thresh, search, devices, tp, **kwargs)
                for sig in signals
            ]
        elif devices and devices > 1:
            from ..parallel.mesh import make_mesh
            from ..parallel.shard import compress_audio_sharded

            mesh = make_mesh(devices, dp=devices // tp, tp=tp)
            encoded = [
                _prune_tuple(_prune, compress_audio_sharded(
                    sig, framerate, sampwidth, mesh=mesh, tile_size=tile,
                    energy_thresh=energy_thresh, search=search, **kwargs,
                ), framerate, sampwidth)
                for sig in signals
            ]
        else:
            from .encode import compress_audio_packed

            encoded = [
                _prune_tuple(_prune, enc, framerate, sampwidth)
                for enc in compress_audio_packed(
                    signals, framerate, sampwidth, tile_size=tile,
                    energy_thresh=energy_thresh, search=search, **kwargs,
                )
            ]

        outpath = _resolve_out(path, outdir, ".fwav", ".fwav")
        save_compressed_multi(outpath, encoded, transform=transform,
                              decode_damping=_profile_hint(kwargs))
        elapsed = time.time() - start
        in_size = os.path.getsize(path)
        out_size = os.path.getsize(outpath)
        original_len = len(signals[0])
        ratio = compression_ratio(in_size, out_size)
        xrt = x_realtime(original_len, framerate, elapsed)
        logger.info(
            "Compressed %s (%d ch) -> %s  time=%.2fs  ratio=%.2f  "
            "x_realtime=%.1f", path, len(signals), outpath, elapsed, ratio,
            xrt,
        )
        return {
            "input": path, "output": outpath, "time_s": elapsed,
            "ratio": ratio, "x_realtime": xrt, "channels": len(signals),
        }
    except Exception as e:  # noqa: BLE001 — per-file isolation
        logger.exception("Compression failed for %s", path)
        return {"input": path, "error": str(e)}


def _prune_tuple(prune, enc, framerate, sampwidth):
    """(rec, domains, ...) 8-tuple -> pruned compact_bytes 9-tuple."""
    (rec, domains, _n_ranges, range_size, tile_size, domain_step,
     energy_threshold, original_len) = enc
    rec, domains = prune(rec, domains)
    return (rec, domains, range_size, framerate, sampwidth, tile_size,
            domain_step, energy_threshold, original_len)


def _streamed_pruned(signal, framerate, sampwidth, tile, energy_thresh,
                     search, devices, tp, **kwargs):
    """One channel through the streaming encoder + host bank prune; returns
    the compact_bytes 9-tuple (same prune-from-signal recipe as the mono
    streaming branch of process_file_compress)."""
    from ..ops.domains import bank_rows_host
    from .encode import remap_matches

    mesh = None
    if devices and devices > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(devices, dp=devices // tp, tp=tp)
    (
        rec, _, _n_ranges, range_size, tile_size, domain_step,
        energy_threshold, original_len,
    ) = compress_audio_streaming(
        signal, framerate, sampwidth, tile_size=tile,
        energy_thresh=energy_thresh, search=search, mesh=mesh, **kwargs,
    )
    used = np.unique(rec["idx"][rec["idx"] >= 0])
    if used.size == 0:
        bank = np.zeros((1, range_size), np.float32)
    else:
        bank = bank_rows_host(signal, tile_size, range_size, domain_step,
                              used)
        rec = remap_matches(rec, used)
    return (rec, bank, range_size, framerate, sampwidth, tile_size,
            domain_step, energy_threshold, original_len)


def process_files_compress_packed(jobs, tile=1024, energy_thresh=1e-4,
                                  search="auto", prune_bank=False,
                                  compact=False, objective="balanced",
                                  devices=1, tp=1):
    """Batch compress with PACKED device dispatches (CLI `--batch
    --packed`): all readable inputs encode through
    models.encode.compress_audio_packed — one vmapped dispatch per
    same-bucket stack of files — then save per file. Small-file batch
    throughput is transport-round-trip-bound in the thread-pool mode; this
    amortizes the round trip across up to PACK_B_MAX files.

    jobs: [(input_wav, output_fwav), ...]. Returns per-file metric dicts
    ("packed": True marks files that went through a packed dispatch;
    time_s is the packed encode+save wall time divided across those files
    — long-file/fallback encodes carry their own process_file_compress
    metrics). Unreadable files return error dicts without sinking the
    batch, same isolation as process_file_compress."""
    if compact:
        import functools

        from ..io.compact import save_compressed_compact

        prune_bank_ = True
        _save = functools.partial(
            save_compressed_compact,
            decode_damping=_profile_hint({"objective": objective}),
        )
    else:
        _save = save_compressed
        prune_bank_ = prune_bank
    from .encode import compress_audio_packed
    from .encode import prune_bank as _prune

    mesh = None
    if devices and devices > 1:
        # FILE-level data parallelism: the packed stack's batch axis shards
        # over the whole mesh (encode._packed_sharded_core) — on multi-chip
        # hosts every chip encodes its own files in the one SPMD dispatch.
        # tp is accepted for CLI symmetry; files shard over dp*tp flat.
        from ..parallel.mesh import make_mesh

        try:
            mesh = make_mesh(devices, dp=devices // tp, tp=tp)
        except ValueError as e:  # same clean contract as the single-file
            logger.error("Batch mesh setup failed: %s", e)  # path's dicts
            return [{"input": p, "error": str(e)} for p, _ in jobs]
    results = [None] * len(jobs)
    n_packed = 0
    packed_elapsed = 0.0  # time inside packed encode+save only (see time_s)
    # bounded-memory slices: signals/results of one slice are released
    # before the next slice is read (a directory of thousands of files must
    # not resident the whole corpus)
    slice_files = 64
    for s0 in range(0, len(jobs), slice_files):
        sl = range(s0, min(len(jobs), s0 + slice_files))
        loaded = []
        for k in sl:
            path, outpath = jobs[k]
            try:
                signal, framerate, sampwidth = read_wav_mono(path)
            except Exception as e:  # noqa: BLE001 — per-file isolation
                logger.exception("Compression failed for %s", path)
                results[k] = {"input": path, "error": str(e)}
                continue
            if len(signal) > STREAMING_THRESHOLD:
                # long files take the single-file path (streaming encode,
                # blockwise bank) exactly as the non-packed CLI would
                results[k] = process_file_compress(
                    path, outpath, tile, energy_thresh,
                    prune_bank=prune_bank, search=search, compact=compact,
                    objective=objective,
                )
                continue
            if sampwidth == 4:
                signal = np.clip(signal.astype(np.float32), -1.0, 1.0)
            loaded.append((k, signal, framerate, sampwidth))

        t_slice = time.time()
        try:
            encoded = compress_audio_packed(
                [sig for _, sig, _, _ in loaded], 0, 0, tile_size=tile,
                energy_thresh=energy_thresh, search=search,
                objective=objective, mesh=mesh,
            )
        except Exception:  # noqa: BLE001 — resolve blame per file
            logger.exception(
                "Packed encode failed for a %d-file slice; falling back to "
                "per-file encode", len(loaded),
            )
            for k, *_ in loaded:
                results[k] = process_file_compress(
                    jobs[k][0], jobs[k][1], tile, energy_thresh,
                    prune_bank=prune_bank, search=search, compact=compact,
                    objective=objective,
                )
            continue
        n_packed += len(loaded)
        for (k, _sig, framerate, sampwidth), enc in zip(loaded, encoded):
            path, outpath = jobs[k]
            try:
                (rec, domains, n_ranges, range_size, tile_size, domain_step,
                 energy_threshold, original_len) = enc
                if prune_bank_:
                    rec, domains = _prune(rec, domains)
                # same output-path semantics as process_file_compress
                # (which the long-file and fallback branches route through)
                outpath = _resolve_out(path, outpath, ".fwav", ".fwav")
                _save(
                    outpath, rec, domains, range_size, framerate, sampwidth,
                    tile_size, domain_step, energy_threshold, original_len,
                )
                in_size = os.path.getsize(path)
                out_size = os.path.getsize(outpath)
                results[k] = {
                    "input": path, "output": outpath,
                    "ratio": compression_ratio(in_size, out_size),
                    "packed": True,
                }
            except Exception as e:  # noqa: BLE001
                logger.exception("Compression failed for %s", path)
                results[k] = {"input": path, "error": str(e)}
        packed_elapsed += time.time() - t_slice
    share = packed_elapsed / max(n_packed, 1)
    for r in results:
        if r is not None and r.get("packed"):
            r["time_s"] = share
    logger.info(
        "Packed-compressed %d files in %.2fs (%.1f files/s)",
        n_packed, packed_elapsed,
        n_packed / packed_elapsed if packed_elapsed > 0 else 0,
    )
    return results


def process_file_decompress(path, outdir=None, iterations=8, eps=1e-3,
                            use_gpu=False, s_damping=None, start_s=None,
                            duration_s=None, devices=1, tp=1, **kwargs):
    """File-level decode (reference: process_file_decompress,
    fractal.py:1524-1546). Beyond the reference: start_s/duration_s decode
    only the requested time window (models.decode.decompress_segment —
    exact, per-range independent) and write it as the output WAV.

    s_damping=None (default) honors the container's stored decode hint
    (v2/v3 FLAG_DECODE_HINT — damped-profile files are tuned for
    s_damping=0.25 and land BELOW the default profile at damping=0) and
    falls back to the reference default 0.0 when no hint is stored. Pass an
    explicit float (including 0.0) to override the hint.

    devices>1 runs the damped (s_damping>0, device while_loop) decode
    range-sharded over an N-device mesh's dp axis — per-range independent,
    zero communication (models.decode._decode_core_sharded). The default
    s_damping=0 decode is a host-side closed form and ignores the mesh.

    Multichannel v3 containers (compress channels="keep"/"ms") decode every
    stored channel with the identical per-channel semantics, undo a
    mid/side transform, and write a multichannel WAV — detected from the
    version byte, no caller opt-in needed."""
    try:
        start = time.time()
        hint_applied = None
        if s_damping is None:
            hint_applied = _stored_decode_hint(path)
            s_damping = hint_applied if hint_applied is not None else 0.0
            if hint_applied:
                logger.info(
                    "Using stored decode hint: s_damping=%.2f "
                    "(pass --damping to override)", s_damping,
                )
        if devices and devices > 1 and s_damping > 0:
            # the default s_damping=0 decode is a host-side closed form and
            # ignores the mesh (see the CLI help) — don't even build one,
            # so --devices N stays harmless on smaller hosts
            from ..parallel.mesh import make_mesh

            kwargs["mesh"] = make_mesh(devices, dp=devices // tp, tp=tp)
        from ..io.container import read_version

        if read_version(path) == 3:
            return _process_file_decompress_multi(
                path, outdir, start, iterations=iterations, eps=eps,
                use_gpu=use_gpu, s_damping=s_damping, start_s=start_s,
                duration_s=duration_s, **kwargs,
            )
        (
            rec, domains, n_ranges, range_size, framerate, sampwidth,
            tile_size, domain_step, energy_threshold, original_len,
        ) = load_compressed_arrays(path)
        # convergence observability (fractal.py:1464-1466): decode fills
        # iterations/final_delta/converged, surfaced in the metrics dict
        dec_stats = kwargs.setdefault("stats", {})
        if start_s is not None or duration_s is not None:
            from .decode import decompress_segment

            a = int(round((start_s or 0.0) * framerate))
            b = (
                a + int(round(duration_s * framerate))
                if duration_s is not None else int(original_len)
            )
            recon = decompress_segment(
                rec, domains, n_ranges, range_size, a, b,
                original_len=original_len, iterations=iterations,
                convergence_eps=eps, use_gpu=use_gpu, s_damping=s_damping,
                **kwargs,
            )
        else:
            recon = decompress_audio(
                rec, domains, n_ranges, range_size, iterations=iterations,
                convergence_eps=eps, use_gpu=use_gpu,
                original_len=original_len, s_damping=s_damping, **kwargs,
            )
        if sampwidth == 4:
            recon = np.clip(recon, -1.0, 1.0)
        outpath = _resolve_out(path, outdir, "_recon.wav", ".wav")
        write_wav(outpath, np.asarray(recon), framerate, sampwidth)
        elapsed = time.time() - start
        xrt = x_realtime(len(recon), framerate, elapsed)
        logger.info(
            "Decompressed %s -> %s  time=%.2fs  x_realtime=%.1f",
            path, outpath, elapsed, xrt,
        )
        out = {"input": path, "output": outpath, "time_s": elapsed,
               "x_realtime": xrt}
        if s_damping:
            out["s_damping"] = s_damping
            if hint_applied is not None:
                out["s_damping_from_hint"] = True
        if dec_stats:
            out["decode_iterations"] = dec_stats["iterations"]
            out["decode_final_delta"] = dec_stats["final_delta"]
            out["decode_converged"] = dec_stats["converged"]
        return out
    except Exception as e:  # noqa: BLE001
        logger.exception("Decompression failed for %s", path)
        return {"input": path, "error": str(e)}


def _process_file_decompress_multi(path, outdir, start, iterations=8,
                                   eps=1e-3, use_gpu=False, s_damping=0.0,
                                   start_s=None, duration_s=None, **kwargs):
    """Decode a v3 multichannel container: every stored channel runs the
    same decoder (closed form / damped / segment) as the mono path, a
    mid/side transform is inverted, and the channels write as one
    frame-major WAV. Caller (process_file_decompress) owns the error dict."""
    from ..io.multich import TRANSFORM_MS, load_compressed_multi, ms_inverse

    channels, transform = load_compressed_multi(path)
    recons = []
    for (
        rec, domains, n_ranges, range_size, framerate, sampwidth,
        _tile_size, _domain_step, _energy_threshold, original_len,
    ) in channels:
        if start_s is not None or duration_s is not None:
            from .decode import decompress_segment

            a = int(round((start_s or 0.0) * framerate))
            b = (
                a + int(round(duration_s * framerate))
                if duration_s is not None else int(original_len)
            )
            recon = decompress_segment(
                rec, domains, n_ranges, range_size, a, b,
                original_len=original_len, iterations=iterations,
                convergence_eps=eps, use_gpu=use_gpu, s_damping=s_damping,
                **kwargs,
            )
        else:
            recon = decompress_audio(
                rec, domains, n_ranges, range_size, iterations=iterations,
                convergence_eps=eps, use_gpu=use_gpu,
                original_len=original_len, s_damping=s_damping, **kwargs,
            )
        recons.append(np.asarray(recon))
    out = np.stack(recons, axis=1)
    if transform == TRANSFORM_MS:
        out = ms_inverse(out)
    if sampwidth == 4:
        out = np.clip(out, -1.0, 1.0)
    outpath = _resolve_out(path, outdir, "_recon.wav", ".wav")
    write_wav(outpath, out, framerate, sampwidth)
    elapsed = time.time() - start
    xrt = x_realtime(len(out), framerate, elapsed)
    logger.info(
        "Decompressed %s (%d ch) -> %s  time=%.2fs  x_realtime=%.1f",
        path, out.shape[1], outpath, elapsed, xrt,
    )
    return {
        "input": path, "output": outpath, "time_s": elapsed,
        "x_realtime": xrt, "channels": int(out.shape[1]),
    }
