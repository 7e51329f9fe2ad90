"""Packed batch encode (models.encode.compress_audio_packed; CLI
`compress --batch --packed`).

One vmapped device dispatch encodes a stack of same-bucket files,
amortizing the per-dispatch transport round trip that bounds small-file
batch throughput. Records must match the single-shot encoder's exactly on
tie-free content; the host refit/bank protocol is shared
(_finalize_encode). Replaces the reference's file-level
multiprocessing.Pool (fractal.py:1605-1617) with one SPMD program.
"""

import json

import numpy as np
import pytest

from fwav_tpu import compress_audio_arrays, compress_audio_packed


def _sigs():
    rng = np.random.default_rng(4)
    sigs = []
    for k in range(5):
        n = 16000 + 700 * k  # varied lengths; first few share buckets
        t = np.arange(n) / 16000
        s = 0.4 * np.sin(2 * np.pi * (300 + 40 * k) * t)
        s += 0.01 * rng.standard_normal(n)
        s[2000:3000] = 0.0
        sigs.append(np.round(s * 16000).astype(np.float32))
    sigs.append(np.zeros(0, np.float32))      # empty input
    sigs.append(np.zeros(8000, np.float32))   # all-silent input
    sigs.append((rng.standard_normal(9000) * 0.3).astype(np.float32))  # float
    return sigs


def test_packed_matches_single_shot():
    sigs = _sigs()
    packed = compress_audio_packed(sigs, 16000, 2, tile_size=128)
    for i, sig in enumerate(sigs):
        single = compress_audio_arrays(sig, 16000, 2, tile_size=128)
        for f in ("idx", "s", "o", "sym", "err"):
            np.testing.assert_array_equal(
                packed[i][0][f], single[0][f], err_msg=f"file {i} field {f}"
            )
        np.testing.assert_array_equal(packed[i][1], single[1])
        assert packed[i][2:] == single[2:]


def test_packed_order_and_pack_boundary():
    # >PACK_B_MAX same-bucket files: exercises chunking + pow2 padding and
    # proves results return in input order
    from fwav_tpu.models.encode import PACK_B_MAX

    rng = np.random.default_rng(9)
    n = 12000
    t = np.arange(n) / 16000
    sigs = [
        np.round(
            (0.3 * np.sin(2 * np.pi * (200 + 17 * k) * t)
             + 0.01 * rng.standard_normal(n)) * 16000
        ).astype(np.float32)
        for k in range(PACK_B_MAX + 3)
    ]
    packed = compress_audio_packed(sigs, 16000, 2, tile_size=128)
    for k in (0, PACK_B_MAX - 1, PACK_B_MAX, PACK_B_MAX + 2):
        single = compress_audio_arrays(sigs[k], 16000, 2, tile_size=128)
        np.testing.assert_array_equal(packed[k][0]["idx"], single[0]["idx"])
        np.testing.assert_array_equal(packed[k][0]["o"], single[0]["o"])


def test_cli_packed_batch(tmp_path):
    from fwav_tpu.cli import main as cli_main
    from fwav_tpu.io.container import load_compressed_arrays
    from fwav_tpu.io.wav import write_wav

    rng = np.random.default_rng(11)
    indir = tmp_path / "wavs"
    indir.mkdir()
    n = 14000
    t = np.arange(n) / 16000
    for k in range(4):
        s = 0.4 * np.sin(2 * np.pi * (250 + 30 * k) * t)
        s += 0.01 * rng.standard_normal(n)
        write_wav(indir / f"f{k}.wav", np.round(s * 16000).astype(np.float32),
                  16000, 2)
    (indir / "broken.wav").write_bytes(b"RIFFgarbage")
    out = tmp_path / "out"
    cli_main(["compress", str(indir), "--batch", "--packed", "--out",
              str(out), "--tile", "128"])
    metrics = json.loads((out / "compression_metrics.json").read_text())
    ok = [m for m in metrics if "error" not in m]
    bad = [m for m in metrics if "error" in m]
    assert len(ok) == 4 and len(bad) == 1
    assert all(m.get("packed") for m in ok)
    for m in ok:
        rec, bank, n_r, N, sr, sw, *_ = load_compressed_arrays(m["output"])
        assert sr == 16000 and sw == 2 and n_r > 0
    # skip-resume parity: second run finds nothing to do
    cli_main(["compress", str(indir), "--batch", "--packed", "--out",
              str(out), "--tile", "128"])
