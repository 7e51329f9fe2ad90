"""ctypes binding for the native .fwav runtime (native/fwavio.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes write/read entry points operating directly on numpy buffers — one
pass, no interpreter-time per record, SHA-256 inline with the file write.
Falls back silently when no compiler is available; io.container picks the
native path automatically when it loads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "fwavio.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libfwavio.so")
_lock = threading.Lock()
_lib = None
_tried = False

_ERRORS = {
    -1: "cannot open file",
    -2: "I/O error",
    -3: "checksum seek/write failed",
    -4: "close failed",
    -5: "Not a FWAV file",
    -6: "Unsupported FWAV version",
    -7: "Truncated FWAV payload",
    -8: "Checksum mismatch — file may be corrupted",
}


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        lib = os.path.abspath(_LIB)
        try:
            if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
                base = ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src]
                try:
                    subprocess.run(
                        base[:1] + ["-march=native"] + base[1:],
                        check=True, capture_output=True, timeout=120,
                    )
                except Exception:
                    subprocess.run(base, check=True, capture_output=True, timeout=120)
            cdll = ctypes.CDLL(lib)
        except Exception:
            return None

        cdll.fwav_write.restype = ctypes.c_int
        cdll.fwav_write.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint8,
            ctypes.c_uint16, ctypes.c_uint16, ctypes.c_float, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
        ]
        cdll.fwav_read_header.restype = ctypes.c_int
        cdll.fwav_read_header.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        cdll.fwav_read_payload.restype = ctypes.c_int
        cdll.fwav_read_payload.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        cdll.fwav_refit.restype = ctypes.c_int
        cdll.fwav_refit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        cdll.fwav_collect.restype = ctypes.c_int
        cdll.fwav_collect.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_void_p,
        ]
        try:  # round-4 additions: absent from a stale cached library
            cdll.fwav_rans_encode.restype = ctypes.c_int64
            cdll.fwav_rans_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
            cdll.fwav_rans_decode.restype = ctypes.c_int64
            cdll.fwav_rans_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            cdll.fwav_pack_bits.restype = ctypes.c_int64
            cdll.fwav_pack_bits.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            cdll.fwav_unpack_bits.restype = ctypes.c_int64
            cdll.fwav_unpack_bits.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p,
            ]
        except AttributeError:
            cdll.fwav_rans_encode = None
            cdll.fwav_rans_decode = None
            cdll.fwav_pack_bits = None
            cdll.fwav_unpack_bits = None
        try:  # round-5: explicit probability resolution (wide idx alphabets)
            cdll.fwav_rans_encode_pb.restype = ctypes.c_int64
            cdll.fwav_rans_encode_pb.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64,
            ]
            cdll.fwav_rans_decode_pb.restype = ctypes.c_int64
            cdll.fwav_rans_decode_pb.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64,
            ]
        except AttributeError:
            cdll.fwav_rans_encode_pb = None
            cdll.fwav_rans_decode_pb = None
        _lib = cdll
        return _lib


def available() -> bool:
    return _load() is not None


def _check(code: int):
    if code != 0:
        raise ValueError(_ERRORS.get(code, f"fwavio error {code}"))


def write(path, rec: np.ndarray, domains: np.ndarray, range_size, framerate,
          sampwidth, tile_size, domain_step, energy_threshold, original_len) -> bool:
    """Native single-pass writer. Returns False if the library is
    unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return False
    domains = np.ascontiguousarray(domains, dtype=np.float32)
    rec = np.ascontiguousarray(rec)
    _check(
        lib.fwav_write(
            str(path).encode(), int(range_size), int(framerate), int(sampwidth),
            int(tile_size), int(domain_step), float(energy_threshold),
            len(rec), len(domains), int(original_len),
            domains.ctypes.data_as(ctypes.c_void_p),
            rec.ctypes.data_as(ctypes.c_void_p),
        )
    )
    return True


def refit(ranges: np.ndarray, bank: np.ndarray, idx: np.ndarray,
          s_clip: float):
    """Native exact affine refit (ops/affine.refit_host semantics): one pass
    per row, no M-sized temporaries. `ranges` (M, N) f32 C-contiguous, `bank`
    (D, N) f32, `idx` (M,) int32 valid rows. Returns (s, o, err, sym-bool)
    or None when the library is unavailable. Raises IndexError on an
    out-of-range domain index (matching numpy's take)."""
    lib = _load()
    if lib is None:
        return None
    bank = np.ascontiguousarray(bank, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    m, n = ranges.shape
    s = np.empty(m, np.float32)
    o = np.empty(m, np.float32)
    err = np.empty(m, np.float32)
    sym = np.empty(m, np.bool_)
    rc = lib.fwav_refit(
        ranges.ctypes.data_as(ctypes.c_void_p),
        bank.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p),
        m, n, len(bank), float(s_clip),
        s.ctypes.data_as(ctypes.c_void_p),
        o.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p),
        sym.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == -10:
        raise IndexError("refit: domain index out of range for the bank")
    _check(rc)
    return s, o, err, sym


def collect(codes: np.ndarray, ranges: np.ndarray, bank: np.ndarray,
            s_clip: float):
    """Native 3-byte-code -> packed MATCH record pass (decode + sentinel +
    exact refit + struct pack in one row-wise loop; the native form of
    models/encode.collect_idx_matches). `codes` (M, 3) uint8 C-contiguous.
    Returns the MATCH_DTYPE record array or None when unavailable."""
    from .container import MATCH_DTYPE

    lib = _load()
    if lib is None:
        return None
    bank = np.ascontiguousarray(bank, dtype=np.float32)
    m, n = ranges.shape
    rec = np.empty(m, dtype=MATCH_DTYPE)
    rc = lib.fwav_collect(
        codes.ctypes.data_as(ctypes.c_void_p),
        ranges.ctypes.data_as(ctypes.c_void_p),
        bank.ctypes.data_as(ctypes.c_void_p),
        m, n, len(bank), float(s_clip),
        rec.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == -10:
        raise IndexError("collect: domain index out of range for the bank")
    _check(rc)
    return rec


def read(path, verify_checksum: bool = True):
    """Native loader: returns the same 10-tuple as
    io.container.load_compressed_arrays, or None when unavailable."""
    from .container import MATCH_DTYPE

    lib = _load()
    if lib is None:
        return None
    ints = np.zeros(9, dtype=np.int64)
    thr = ctypes.c_double()
    _check(
        lib.fwav_read_header(
            str(path).encode(), ints.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(thr),
        )
    )
    (_, range_size, framerate, sampwidth, tile_size, domain_step,
     n_ranges, n_domains, original_len) = (int(v) for v in ints)

    domains = np.empty((n_domains, range_size), dtype=np.float32)
    rec = np.empty(n_ranges, dtype=MATCH_DTYPE)
    _check(
        lib.fwav_read_payload(
            str(path).encode(), range_size, n_ranges, n_domains,
            1 if verify_checksum else 0,
            domains.ctypes.data_as(ctypes.c_void_p),
            rec.ctypes.data_as(ctypes.c_void_p),
        )
    )
    return (
        rec, domains, n_ranges, range_size, framerate, sampwidth,
        tile_size, domain_step, float(thr.value), original_len,
    )


def rans_encode(symbols: np.ndarray, freqs: np.ndarray, prob_bits: int = 12):
    """Native lane-interleaved rANS encode, BIT-IDENTICAL to io.rans.encode
    (tested head-to-head in tests/test_native_rans.py). Returns the stream
    bytes, or None when the library (or symbol, on a stale build) is
    unavailable. Non-default prob_bits requires the round-5 _pb entry
    point; on a stale library only the default resolution runs natively."""
    lib = _load()
    if lib is None:
        return None
    use_pb = getattr(lib, "fwav_rans_encode_pb", None) is not None
    if not use_pb and (
        prob_bits != 12 or getattr(lib, "fwav_rans_encode", None) is None
    ):
        return None
    from .rans import _lanes_for  # capacity bound must track the spec's lanes

    sym = np.ascontiguousarray(symbols, dtype=np.int64)
    f = np.ascontiguousarray(freqs, dtype=np.int64)
    m = len(sym)
    out = np.empty(4 * _lanes_for(m) + 2 * m + 16, np.uint8)
    if use_pb:
        rc = lib.fwav_rans_encode_pb(
            sym.ctypes.data_as(ctypes.c_void_p), m,
            f.ctypes.data_as(ctypes.c_void_p), len(f),
            out.ctypes.data_as(ctypes.c_void_p), len(out), int(prob_bits),
        )
    else:
        rc = lib.fwav_rans_encode(
            sym.ctypes.data_as(ctypes.c_void_p), m,
            f.ctypes.data_as(ctypes.c_void_p), len(f),
            out.ctypes.data_as(ctypes.c_void_p), len(out),
        )
    if rc < 0:
        return None  # fall back to the numpy spec (bad input surfaces there)
    return out[:rc].tobytes()


def rans_decode(buf: bytes, m: int, freqs: np.ndarray, prob_bits: int = 12):
    """Native rANS decode. Returns the int64 symbol array, None when the
    library is unavailable. Raises the format's ValueError on a truncated
    stream (matching io.rans.decode)."""
    lib = _load()
    if lib is None:
        return None
    use_pb = getattr(lib, "fwav_rans_decode_pb", None) is not None
    if not use_pb and (
        prob_bits != 12 or getattr(lib, "fwav_rans_decode", None) is None
    ):
        return None
    f = np.ascontiguousarray(freqs, dtype=np.int64)
    data = np.frombuffer(buf, np.uint8)
    out = np.empty(int(m), np.int64)
    if use_pb:
        rc = lib.fwav_rans_decode_pb(
            data.ctypes.data_as(ctypes.c_void_p), len(data), int(m),
            f.ctypes.data_as(ctypes.c_void_p), len(f),
            out.ctypes.data_as(ctypes.c_void_p), int(prob_bits),
        )
    else:
        rc = lib.fwav_rans_decode(
            data.ctypes.data_as(ctypes.c_void_p), len(data), int(m),
            f.ctypes.data_as(ctypes.c_void_p), len(f),
            out.ctypes.data_as(ctypes.c_void_p),
        )
    if rc == -7:
        raise ValueError("Truncated rANS stream")
    if rc != 0:
        return None
    return out


def pack_bits(values: np.ndarray, bits: int):
    """Native LSB-first fixed-width bit pack, identical bytes to
    io.compact._pack_bits (tested head-to-head in tests/test_native_rans.py).
    None when unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "fwav_pack_bits", None) is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.int64)
    m = len(v)
    out = np.empty((m * bits + 7) // 8, np.uint8)
    rc = lib.fwav_pack_bits(
        v.ctypes.data_as(ctypes.c_void_p), m, int(bits),
        out.ctypes.data_as(ctypes.c_void_p), len(out),
    )
    if rc < 0:
        return None
    return out.tobytes()


def unpack_bits(buf: bytes, m: int, bits: int):
    """Native unpack (inverse of pack_bits). None when unavailable or on
    any native-side error; buffer-length validation is the caller's job
    (io.compact._unpack_bits raises the format ValueError before
    dispatching here)."""
    lib = _load()
    if lib is None or getattr(lib, "fwav_unpack_bits", None) is None:
        return None
    data = np.frombuffer(buf, np.uint8)
    out = np.empty(int(m), np.int64)
    rc = lib.fwav_unpack_bits(
        data.ctypes.data_as(ctypes.c_void_p), len(data), int(m), int(bits),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out
