"""The `.fwav` container — bit-compatible with the reference format
(save_compressed fractal.py:1278-1322, load_compressed fractal.py:1325-1375).

Layout (little-endian):

    offset  size  field
    0       4     magic b'FWAV'
    4       1     version u8 (= 1)
    5       4     range_size u32
    9       4     framerate u32
    13      1     sampwidth u8
    14      2     tile_size u16
    16      2     domain_step u16
    18      4     energy_threshold f32
    22      4     n_ranges u32
    26      4     n_domains u32
    30      4     original_len u32
    34      32    SHA-256 of payload (domains then matches, in write order)
    66      n_domains*range_size*4   domain tiles (float32, row-major)
    ...     n_ranges*17              match records '<iffBf' =
                                     (domain_idx i32 [-1 = silent sentinel],
                                      s f32, o f32, sym u8, err f32)

The checksum covers payload bytes only, never the header. `err` may be +inf
and must round-trip through f32. Unlike the reference (per-record Python
struct loop), serialization here is one vectorized numpy pass with chunked
hashing — the host-side cost is O(bytes), not O(records) of interpreter time.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from ..config import FWAV_VERSION

MAGIC = b"FWAV"
_HEADER = struct.Struct("<IIBHHfIII")  # after magic+version
_CHECKSUM_OFFSET = 34
_PAYLOAD_OFFSET = 66
_CHUNK = 1 << 22  # 4 MiB streaming granularity

#: Packed match record: 17 bytes, matching struct '<iffBf'.
MATCH_DTYPE = np.dtype(
    [("idx", "<i4"), ("s", "<f4"), ("o", "<f4"), ("sym", "u1"), ("err", "<f4")]
)
assert MATCH_DTYPE.itemsize == 17


def matches_to_struct(matches) -> np.ndarray:
    """Normalize matches to the packed record array. Accepts a list of
    (idx, s, o, sym, err) tuples (the reference API shape), a dict of arrays,
    or an existing record array."""
    if isinstance(matches, np.ndarray) and matches.dtype == MATCH_DTYPE:
        return matches
    if isinstance(matches, dict):
        n = len(matches["idx"])
        rec = np.empty(n, dtype=MATCH_DTYPE)
        rec["idx"] = np.asarray(matches["idx"], dtype=np.int32)
        rec["s"] = np.asarray(matches["s"], dtype=np.float32)
        rec["o"] = np.asarray(matches["o"], dtype=np.float32)
        rec["sym"] = np.asarray(matches["sym"], dtype=np.uint8)
        rec["err"] = np.asarray(matches["err"], dtype=np.float32)
        return rec
    rec = np.empty(len(matches), dtype=MATCH_DTYPE)
    for i, m in enumerate(matches):
        rec[i] = (int(m[0]), float(m[1]), float(m[2]), int(m[3]), float(m[4]))
    return rec


def struct_to_matches(rec: np.ndarray) -> list:
    """Record array -> list of python tuples (the reference's return shape,
    fractal.py:1373)."""
    return list(
        zip(
            rec["idx"].tolist(),
            rec["s"].astype(np.float64).tolist(),
            rec["o"].astype(np.float64).tolist(),
            rec["sym"].tolist(),
            rec["err"].astype(np.float64).tolist(),
        )
    )


def pack_header(
    range_size, framerate, sampwidth, tile_size, domain_step, energy_threshold,
    n_ranges, n_domains, original_len,
) -> bytes:
    return (
        MAGIC
        + struct.pack("<B", FWAV_VERSION)
        + _HEADER.pack(
            int(range_size), int(framerate), int(sampwidth), int(tile_size),
            int(domain_step), float(energy_threshold), int(n_ranges),
            int(n_domains), int(original_len),
        )
    )


def save_compressed(
    filepath,
    matches,
    domains_array,
    range_size,
    framerate,
    sampwidth,
    tile_size,
    domain_step,
    energy_threshold,
    original_len,
) -> None:
    """Single-pass streaming write with seek-back SHA-256, byte-identical to
    the reference writer (fractal.py:1278-1322). Uses the native C++ writer
    (io.native / native/fwavio.cpp) when the compiled library is available;
    the pure-Python path below produces identical bytes."""
    rec = matches_to_struct(matches)
    domains = np.ascontiguousarray(np.asarray(domains_array, dtype=np.float32))
    n_ranges = len(rec)
    n_domains = len(domains)

    from . import native

    if native.write(
        filepath, rec, domains, range_size, framerate, sampwidth, tile_size,
        domain_step, energy_threshold, original_len,
    ):
        return

    sha = hashlib.sha256()
    with open(filepath, "wb") as f:
        f.write(
            pack_header(
                range_size, framerate, sampwidth, tile_size, domain_step,
                energy_threshold, n_ranges, n_domains, original_len,
            )
        )
        f.write(b"\0" * 32)  # checksum placeholder

        flat = domains.reshape(-1).view(np.uint8)
        for off in range(0, flat.nbytes, _CHUNK):
            chunk = flat[off : off + _CHUNK].tobytes()
            f.write(chunk)
            sha.update(chunk)

        mflat = rec.view(np.uint8).reshape(-1)
        for off in range(0, mflat.nbytes, _CHUNK):
            chunk = mflat[off : off + _CHUNK].tobytes()
            f.write(chunk)
            sha.update(chunk)

        f.seek(_CHECKSUM_OFFSET)
        f.write(sha.digest())


def save_compressed_streaming(
    filepath,
    matches,
    domain_blocks,
    n_domains,
    range_size,
    framerate,
    sampwidth,
    tile_size,
    domain_step,
    energy_threshold,
    original_len,
) -> None:
    """Like save_compressed but takes the domain bank as an ITERATOR of
    (block, range_size) float32 row-blocks, so multi-GB banks from long
    files never materialize in RAM (the reference's memmap-streaming
    capability, fractal.py:1308-1311 write loop + build_domains_memmap)."""
    import os

    rec = matches_to_struct(matches)
    n_ranges = len(rec)

    # write to a sibling temp file and rename on success: a failing block
    # iterator (e.g. row-count mismatch) must never leave a plausible-looking
    # truncated container with a zeroed checksum at the target path
    tmp_path = f"{filepath}.tmp"
    sha = hashlib.sha256()
    written = 0
    try:
        with open(tmp_path, "wb") as f:
            f.write(
                pack_header(
                    range_size, framerate, sampwidth, tile_size, domain_step,
                    energy_threshold, n_ranges, n_domains, original_len,
                )
            )
            f.write(b"\0" * 32)

            for block in domain_blocks:
                b = np.ascontiguousarray(block, dtype=np.float32).tobytes()
                f.write(b)
                sha.update(b)
                written += len(block)
            if written != n_domains:
                raise ValueError(f"domain block iterator yielded {written} rows, expected {n_domains}")

            mflat = rec.view(np.uint8).reshape(-1)
            for off in range(0, mflat.nbytes, _CHUNK):
                chunk = mflat[off : off + _CHUNK].tobytes()
                f.write(chunk)
                sha.update(chunk)

            f.seek(_CHECKSUM_OFFSET)
            f.write(sha.digest())
        os.replace(tmp_path, filepath)
    except BaseException:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise


def read_version(filepath) -> int:
    """Magic check + version byte (1 = reference layout, 2 = compact,
    3 = multichannel — per-channel v2 blobs, io.multich)."""
    with open(filepath, "rb") as f:
        head = f.read(5)
    if len(head) < 5 or head[:4] != MAGIC:
        raise ValueError("Not a FWAV file")
    return head[4]


def read_header(filepath):
    """Parse only the fixed 66-byte header (shared by v1 and the compact
    v2 layout). Returns the 9-tuple (range_size, framerate, sampwidth,
    tile_size, domain_step, energy_threshold, n_ranges, n_domains,
    original_len)."""
    with open(filepath, "rb") as f:
        head = f.read(5 + _HEADER.size)
    if len(head) < 5 or head[:4] != MAGIC:
        raise ValueError("Not a FWAV file")
    if head[4] not in (FWAV_VERSION, 2):
        raise ValueError(f"Unsupported FWAV version: {head[4]}")
    if len(head) < 5 + _HEADER.size:
        raise ValueError("Truncated FWAV payload")
    return _HEADER.unpack(head[5:])


def read_matches(filepath) -> np.ndarray:
    """Read only the match record table, seeking past the domain bank —
    O(n_ranges) I/O however large the bank is. Compact v2 banks are bounded
    by the range count, so the full loader is the same complexity there."""
    version = read_version(filepath)
    if version == 3:
        raise ValueError(
            "Multichannel FWAV container — load via "
            "io.multich.load_compressed_multi (CLI decompress handles it)"
        )
    if version == 2:
        from .compact import load_compressed_compact

        return load_compressed_compact(filepath, verify_checksum=False)[0]
    (range_size, _fr, _sw, _tile, _step, _thr, n_ranges, n_domains, _olen) = (
        read_header(filepath)
    )
    with open(filepath, "rb") as f:
        f.seek(_PAYLOAD_OFFSET + n_domains * range_size * 4)
        buf = f.read(n_ranges * MATCH_DTYPE.itemsize)
    if len(buf) != n_ranges * MATCH_DTYPE.itemsize:
        raise ValueError("Truncated FWAV payload")
    return np.frombuffer(buf, dtype=MATCH_DTYPE)


def load_compressed_arrays(filepath, verify_checksum: bool = True):
    """Load a .fwav, returning the match record array (instead of a tuple
    list) plus the domain bank and header fields. Preferred fast path;
    delegates to the native C++ parser (hardware SHA-NI, single fused
    read+verify pass — measured 1.3x the numpy+hashlib path) when the
    library is built, with this pure-Python path as the fallback.

    Routes by the container's version byte: compact v2 files
    (io.compact, CLI --compact) load through load_compressed_compact and
    return the identical tuple shape. Multichannel v3 files carry one
    record set PER CHANNEL and cannot flatten into this mono tuple —
    they fail loudly here and load via io.multich.load_compressed_multi
    (the CLI decompress/info surfaces route v3 automatically)."""
    version = read_version(filepath)
    if version == 3:
        raise ValueError(
            "Multichannel FWAV container — load via "
            "io.multich.load_compressed_multi (CLI decompress handles it)"
        )
    if version == 2:
        from .compact import load_compressed_compact

        return load_compressed_compact(filepath, verify_checksum=verify_checksum)

    from . import native

    out = native.read(filepath, verify_checksum=verify_checksum)
    if out is not None:
        return out

    with open(filepath, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError("Not a FWAV file")
        version = struct.unpack("<B", f.read(1))[0]
        if version != FWAV_VERSION:
            raise ValueError(f"Unsupported FWAV version: {version}")
        hdr = f.read(_HEADER.size)
        if len(hdr) != _HEADER.size:
            raise ValueError("Truncated FWAV payload")
        (
            range_size, framerate, sampwidth, tile_size, domain_step,
            energy_threshold, n_ranges, n_domains, original_len,
        ) = _HEADER.unpack(hdr)
        stored_checksum = f.read(32)

        dom_bytes = n_domains * range_size * 4
        match_bytes = n_ranges * MATCH_DTYPE.itemsize

        sha = hashlib.sha256() if verify_checksum else None
        dom_buf = f.read(dom_bytes)
        match_buf = f.read(match_bytes)
        if len(dom_buf) != dom_bytes or len(match_buf) != match_bytes:
            raise ValueError("Truncated FWAV payload")
        if verify_checksum:
            for off in range(0, len(dom_buf), _CHUNK):
                sha.update(dom_buf[off : off + _CHUNK])
            for off in range(0, len(match_buf), _CHUNK):
                sha.update(match_buf[off : off + _CHUNK])
            if sha.digest() != stored_checksum:
                raise ValueError("Checksum mismatch — file may be corrupted")

    domains = np.frombuffer(dom_buf, dtype=np.float32).reshape(n_domains, range_size)
    rec = np.frombuffer(match_buf, dtype=MATCH_DTYPE)
    return (
        rec, domains, n_ranges, range_size, framerate, sampwidth, tile_size,
        domain_step, energy_threshold, original_len,
    )


def load_compressed(filepath, verify_checksum: bool = True):
    """Reference-shaped loader: returns the 10-tuple of
    (matches list, domains, n_ranges, range_size, framerate, sampwidth,
    tile_size, domain_step, energy_threshold, original_len)
    matching fractal.py:1325-1375."""
    (
        rec, domains, n_ranges, range_size, framerate, sampwidth, tile_size,
        domain_step, energy_threshold, original_len,
    ) = load_compressed_arrays(filepath, verify_checksum=verify_checksum)
    return (
        struct_to_matches(rec), domains, n_ranges, range_size, framerate,
        sampwidth, tile_size, domain_step, energy_threshold, original_len,
    )
