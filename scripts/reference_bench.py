#!/usr/bin/env python
"""Run the actual reference (CPU, librosa-stubbed, as in
tests/test_reference_compat.py) on bench.py's exact 10 s fixture and report
its encode time + round-trip SNR — the parity anchors for PARITY.md."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "librosa" not in sys.modules:
    stub = types.ModuleType("librosa")

    class _Filters:
        @staticmethod
        def mel(sr=22050, n_fft=2048, n_mels=128, fmin=0.0, fmax=None, **kw):
            return np.zeros((n_mels, 1 + n_fft // 2), dtype=np.float32)

    stub.filters = _Filters()
    sys.modules["librosa"] = stub

sys.path.insert(0, "/root/reference")
import fractal  # noqa: E402

from bench import make_signal  # noqa: E402


def compute_snr(original, reconstructed):
    o = np.asarray(original, np.float64)
    r = np.asarray(reconstructed, np.float64)[: len(o)]
    noise = np.sum((o - r) ** 2)
    return float("inf") if noise == 0 else 10 * np.log10(np.sum(o * o) / noise)


def main():
    sig = make_signal(10.0, 44100)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        matches, domains, n_ranges, range_size, tile, step, thr, olen = (
            fractal.compress_audio(
                sig, 44100, 2, use_gpu=False, domains_tmpdir=td,
                cpu_workers=1,
            )
        )
        enc_s = time.time() - t0
    t0 = time.time()
    recon = np.asarray(
        fractal.decompress_audio(
            matches, np.asarray(domains), n_ranges, range_size,
            original_len=olen, use_gpu=False,
        )
    )
    dec_s = time.time() - t0
    out = {
        "reference_encode_s": round(enc_s, 2),
        "reference_decode_s": round(dec_s, 2),
        "reference_x_realtime": round(10.0 / enc_s, 3),
        "reference_round_trip_snr_db": round(compute_snr(sig, recon), 3),
        "n_ranges": int(n_ranges),
        "n_domains": int(len(domains)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
