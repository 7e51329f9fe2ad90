"""Streaming global-candidate pass (VERDICT r3 item 5).

The time-sharded encoder restricts each shard's search to its halo window,
which starves the clip-aware "damped" objective on content whose
self-similarity is not local (31.4 dB vs the 40.2 dB whole-file oracle on
the 100 s bench fixture). The recovery: a whole-file nomination scan over
the stride-subsampled bank routes remote window candidates to the time
shard that owns them for FULL-RESOLUTION refinement (models.encode
pair_refine), and the host merges local vs global winners by exact float64
gain on the serialized bank rows (ops.affine.damped_gain_host) — measured
38.6 dB on the 100 s fixture. Reference anchor: fractal.py:556-632 searches
the full bank for every range; streaming alone doesn't.
"""

import numpy as np
import pytest

from fwav_tpu import compute_snr, decompress_audio
from fwav_tpu.models.stream import (
    compress_audio_streaming,
    domain_block_iter,
)

KW = dict(tile_size=128, shard_samples=4096, halo=2048, objective="damped")


def _sig(seconds=1.5, sr=8000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = 0.4 * np.sin(2 * np.pi * 310 * t) + 0.12 * np.sin(2 * np.pi * 1100 * t)
    sig += 0.02 * rng.standard_normal(len(t))
    sig[int(0.6 * sr) : int(0.72 * sr)] = 0.0  # silence -> sentinels
    return np.round(sig * 12000).astype(np.float32), sr


@pytest.fixture(scope="module")
def enc():
    sig, sr = _sig()
    on = compress_audio_streaming(sig, sr, 2, **KW)
    off = compress_audio_streaming(sig, sr, 2, global_candidates=False, **KW)
    return sig, sr, on, off


def _decode(sig, res):
    rec, _, n_ranges, rs, tile, step, _, olen = res
    bank = np.concatenate(list(domain_block_iter(sig, tile, rs, step)))
    return decompress_audio(
        rec, bank, n_ranges, rs, original_len=olen, s_damping=0.25
    )


def test_global_pass_improves_damped_snr():
    # the halo has to HURT for the pass to show: at the default tile (1024)
    # a slowly-modulated partial needs remote candidates (measured 19.2 vs
    # 12.3 dB); the small-tile module fixture is halo-insensitive
    rng = np.random.default_rng(0)
    sr = 8000
    t = np.arange(sr * 3) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 2213 * t * (1 + 0.2 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.01 * rng.standard_normal(sr * 3)
    ).astype(np.float32)
    kw = dict(shard_samples=1 << 13, halo=1 << 12, objective="damped")
    on = compress_audio_streaming(sig, sr, 2, **kw)
    off = compress_audio_streaming(sig, sr, 2, global_candidates=False, **kw)
    snr_on = compute_snr(sig, _decode(sig, on))
    snr_off = compute_snr(sig, _decode(sig, off))
    assert snr_on > snr_off + 3.0, (snr_on, snr_off)
    # the pass may only SWAP matches, never invalidate the record layout
    rec_on, rec_off = on[0], off[0]
    assert len(rec_on) == len(rec_off)
    # sentinels (energy-pruned ranges) are never resurrected by the merge
    np.testing.assert_array_equal(rec_on["idx"] == -1, rec_off["idx"] == -1)


def test_global_pass_auto_gate(enc):
    sig, sr, on, off = enc
    # damped default = auto-on: explicit True is the same encode
    explicit = compress_audio_streaming(
        sig, sr, 2, global_candidates=True, **KW
    )
    np.testing.assert_array_equal(explicit[0], on[0])
    assert np.any(on[0]["idx"] != off[0]["idx"])  # the pass changed records

    # balanced default = auto-off (halo-insensitive objective)
    kw = dict(KW, objective="balanced")
    base = compress_audio_streaming(sig, sr, 2, **kw)
    forced_off = compress_audio_streaming(
        sig, sr, 2, global_candidates=False, **kw
    )
    np.testing.assert_array_equal(base[0], forced_off[0])


@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 4)])
def test_global_pass_mesh_bit_equal(dp, tp, enc):
    # pair slabs split over every device (flat dp x tp); the per-pair
    # program is identical at every sharding and the merge is host-side
    # float64, so records stay bit-equal to single-device
    from fwav_tpu.parallel.mesh import make_mesh

    sig, sr, on, _ = enc
    mesh = make_mesh(dp * tp, dp=dp, tp=tp)
    got = compress_audio_streaming(sig, sr, 2, mesh=mesh, **KW)
    np.testing.assert_array_equal(got[0], on[0])


def test_global_pass_resume(tmp_path, enc):
    sig, sr, on, _ = enc
    rdir = str(tmp_path / "ckpt")
    first = compress_audio_streaming(sig, sr, 2, resume_dir=rdir, **KW)
    np.testing.assert_array_equal(first[0], on[0])

    # full resume: every shard (records + pair codes) comes from disk
    resumed = compress_audio_streaming(sig, sr, 2, resume_dir=rdir, **KW)
    np.testing.assert_array_equal(resumed[0], on[0])

    # a missing pairs file voids that shard's checkpoint (re-encoded, not
    # merged without its refinements)
    import glob
    import os

    pfiles = sorted(glob.glob(os.path.join(rdir, "*", "*_pairs.npy")))
    assert pfiles, "pair checkpoints were not written"
    os.remove(pfiles[0])
    healed = compress_audio_streaming(sig, sr, 2, resume_dir=rdir, **KW)
    np.testing.assert_array_equal(healed[0], on[0])
    assert os.path.exists(pfiles[0])  # re-written by the re-encode


def test_damped_gain_host_matches_device_objective():
    # the host merge (float64, ops.affine.damped_gain_host) must score with
    # the SAME clip-aware objective as the device selection
    # (ops.search._gain_from_num with domain_thresh), or the merge could
    # overturn device-preferred winners; assert value agreement at f32
    # precision on random data, clipped and unclipped branches both hit
    import jax.numpy as jnp

    from fwav_tpu.ops.affine import damped_gain_host
    from fwav_tpu.ops.search import _window_gains

    rng = np.random.default_rng(7)
    M, N, D = 256, 4, 512
    ranges = rng.standard_normal((M, N)).astype(np.float32)
    # scale spread forces both the quadratic and the clipped branch
    ranges[: M // 2] *= 64.0
    bank = rng.standard_normal((D, N)).astype(np.float32)
    cand = rng.integers(0, D, size=M).astype(np.int32)

    host = damped_gain_host(ranges, bank[cand], s_clip=16.0)

    r_t = jnp.asarray(ranges).T
    r_c = r_t - jnp.mean(r_t, axis=0)[None, :]
    dev, _ = _window_gains(
        r_c, jnp.asarray(bank).T, jnp.asarray(cand)[None, :],
        jnp.ones((1, M), bool), "damped", 16.0,
    )
    np.testing.assert_allclose(host, np.asarray(dev[0]), rtol=2e-4)


def test_refine_centers_matches_coarse_path():
    # refine_from_lobes(centers=...) is the same refinement as the coarse
    # protocol when the centers sit exactly on the coarse grid
    import jax.numpy as jnp

    from fwav_tpu.ops.search import refine_from_lobes

    rng = np.random.default_rng(0)
    M, N, D, stride = 64, 4, 4096, 64
    ranges = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32))
    d_valid = jnp.ones(D, bool)
    coarse = rng.integers(0, D // stride, size=(M, 1)).astype(np.int32)
    coarse[: M // 8] = -1  # dead lobes stay dead in both protocols
    want = refine_from_lobes(
        ranges, bank, d_valid, jnp.asarray(coarse), stride, 16.0, "damped",
        return_score=True,
    )
    centers = np.where(coarse >= 0, coarse * stride, -1).astype(np.int32)
    got = refine_from_lobes(
        ranges, bank, d_valid, None, stride, 16.0, "damped",
        return_score=True, centers=jnp.asarray(centers),
    )
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
