"""Streaming x multi-chip composition (SURVEY.md §2.5 SP/CP + DP/TP): the
time-sharded encode dispatching every shard through shard_map over a
(dp, tp) mesh must produce records BIT-EQUAL to the single-device streaming
encode — the idx-only device->host protocol + host refit make selections the
only device output, and per-shard searches see identical bucketed shapes.

Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

from fwav_tpu.models.stream import compress_audio_streaming
from fwav_tpu.parallel.mesh import make_mesh


def _noise_sig(seconds=1.5, sr=8000, seed=3):
    # noise-bearing content: no mirror ties, so selections are unambiguous
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = 0.4 * np.sin(2 * np.pi * 310 * t) + 0.12 * np.sin(2 * np.pi * 1100 * t)
    sig += 0.02 * rng.standard_normal(len(t))
    sig[int(0.6 * sr) : int(0.72 * sr)] = 0.0  # silence gap -> sentinels
    return np.round(sig * 12000).astype(np.float32), sr


KW = dict(tile_size=128, shard_samples=4096, halo=2048)


@pytest.fixture(scope="module")
def _single_device_stream():
    sig, sr = _noise_sig()
    rec, *rest = compress_audio_streaming(sig, sr, 2, **KW)
    return sig, sr, rec, rest


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_streaming_sharded_bit_equal(dp, tp, _single_device_stream):
    sig, sr, want, rest = _single_device_stream
    mesh = make_mesh(dp * tp, dp=dp, tp=tp)
    got, *rest_s = compress_audio_streaming(
        sig, sr, 2, mesh=mesh, search="exact" if tp > 1 else "auto", **KW
    )
    if tp == 1:
        np.testing.assert_array_equal(got, want)
    else:
        # tp forces exact search; the auto mode on these shapes is exact
        # too, so records still match bit for bit
        np.testing.assert_array_equal(got, want)
    assert rest_s[:3] == rest[:3]
    assert np.any(got["idx"] == -1)  # sentinels survive the composition


def test_streaming_sharded_coarse_bit_equal(_single_device_stream):
    # coarse + tp under streaming: the tp axis range-splits each time
    # shard's slab (encode._range_split_factor pads the range bucket)
    sig, sr = _noise_sig(seconds=4.0, seed=9)
    kw = dict(tile_size=512, shard_samples=16384, halo=8192, search="coarse")
    want, *_ = compress_audio_streaming(sig, sr, 2, **kw)
    mesh = make_mesh(4, dp=2, tp=2)
    got, *_ = compress_audio_streaming(sig, sr, 2, mesh=mesh, **kw)
    np.testing.assert_array_equal(got, want)


def test_streaming_file_level_with_devices(tmp_path, monkeypatch):
    # process_file_compress composes streaming with --devices/--tp
    import fwav_tpu.models.codec as codec
    from fwav_tpu import compute_snr
    from fwav_tpu.io.wav import read_wav_mono, write_wav
    from fwav_tpu.models.codec import (
        process_file_compress,
        process_file_decompress,
    )

    monkeypatch.setattr(codec, "STREAMING_THRESHOLD", 8000)
    sig, sr = _noise_sig()
    wav = tmp_path / "in.wav"
    write_wav(wav, sig, sr, 2)
    r = process_file_compress(
        str(wav), str(tmp_path / "out.fwav"), tile=128, devices=4, tp=2,
        search="exact", shard_samples=4096, halo=2048,
    )
    assert "error" not in r, r
    r2 = process_file_decompress(r["output"], str(tmp_path / "rec.wav"))
    assert "error" not in r2, r2
    recon, _, _ = read_wav_mono(r2["output"])
    assert compute_snr(sig, recon) > 8.0


def test_streaming_sharded_topk_bit_equal(_single_device_stream):
    """topk + tp under streaming: every time shard's per-shard MIPS
    shortlists merge into the exact global top-k (same core as the
    single-shot path), bit-equal to single-device streaming topk."""
    sig, sr, _, _ = _single_device_stream
    kw = dict(search="topk", **KW)
    want, *_ = compress_audio_streaming(sig, sr, 2, **kw)
    mesh = make_mesh(8, dp=2, tp=4)
    got, *_ = compress_audio_streaming(sig, sr, 2, mesh=mesh, **kw)
    np.testing.assert_array_equal(got, want)
