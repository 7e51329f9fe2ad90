"""The clip-aware "damped" encode objective (VERDICT r2 item 2): selection
matched to the damped decoder's fixed point (the stored affine transform,
fractal.py:1445), harvesting quality far above the s_damping=0 decoder's
piecewise-constant bound at identical rate and unchanged container."""

import numpy as np
import pytest

from fwav_tpu import compress_audio_arrays, compute_snr, decompress_audio


def _fixture(kind):
    if kind == "speechlike":
        rng = np.random.default_rng(0)
        sr = 16000
        t = np.arange(int(sr * 1.0)) / sr
        sig = (
            0.4 * np.sin(2 * np.pi * (200 + 300 * t) * t)
            + 0.2 * np.sin(2 * np.pi * 800 * t)
            + 0.01 * rng.standard_normal(len(t))
        )
        sig[int(0.3 * sr) : int(0.4 * sr)] = 0.0
        return (sig * 0.5 * (2**15 - 1)).astype(np.float32), sr
    rng = np.random.default_rng(7)
    sr = 44100
    t = np.arange(int(sr * 2.0)) / sr
    sig = (
        0.3 * np.sin(2 * np.pi * 440 * t * (1 + 0.1 * np.sin(2 * np.pi * 3 * t)))
        + 0.2 * np.sin(2 * np.pi * 1200 * t)
        + 0.02 * rng.standard_normal(len(t))
    )
    return (sig * 12000).astype(np.float32), sr


def _pc_bound_db(sig, n):
    """The s_damping=0 decoder's quality ceiling: the best piecewise-
    constant reconstruction (per-range mean)."""
    L = (len(sig) // n) * n
    x = sig[:L].reshape(-1, n).astype(np.float64)
    noise = ((x - x.mean(1, keepdims=True)) ** 2).sum()
    tail = sig[L:].astype(np.float64)
    if len(tail):
        noise += ((tail - tail.mean()) ** 2).sum()
    return 10 * np.log10((sig.astype(np.float64) ** 2).sum() / noise)


def test_damped_gain_matches_bruteforce_oracle():
    """exact search with objective='damped' must select exactly the
    (domain, orientation) maximizing the clip-aware gain
    g = num^2/denom if |s*|<=c else 2c|num| - c^2 denom (f64 oracle)."""
    import jax.numpy as jnp

    from fwav_tpu.ops.affine import affine_stats
    from fwav_tpu.ops.search import exact_search_block

    rng = np.random.default_rng(3)
    M, D, N, c = 64, 512, 4, 2.0
    r = (rng.standard_normal((M, N)) * 0.6).astype(np.float32)
    bank = (rng.standard_normal((D, N)) * 0.15).astype(np.float32)
    valid = np.ones(D, bool)
    valid[-13:] = False

    dm, dd = affine_stats(jnp.asarray(bank))
    idx, s, o, sym, err = (
        np.asarray(x)
        for x in exact_search_block(
            jnp.asarray(r), jnp.asarray(bank), dm, dd, jnp.asarray(valid),
            domain_block=64, s_clip=c, objective="damped",
        )
    )

    # f64 oracle
    r_c = r.astype(np.float64) - r.mean(1, keepdims=True)
    D_c = bank.astype(np.float64) - bank.astype(np.float64).mean(1, keepdims=True)
    denom = (D_c * D_c).sum(1)

    def gain(num):
        a = np.abs(num)
        return np.where(a > c * denom, c * (2 * a - c * denom),
                        a * a / np.maximum(denom, 1e-12))

    num_o = r_c @ bank.T.astype(np.float64)
    num_m = r_c[:, ::-1] @ bank.T.astype(np.float64)
    g = np.maximum(gain(num_o), gain(num_m))
    g[:, ~valid] = -np.inf
    want = np.argmax(g, axis=1)
    # f32 near-ties may legally pick a different but equal-gain winner:
    # compare achieved ORACLE gains, not indices
    got_g = g[np.arange(M), idx]
    want_g = g[np.arange(M), want]
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5)
    # and the clip branch actually fired for some winners
    s_star = np.where(sym.astype(bool)[:, None], num_m, num_o)[
        np.arange(M), idx
    ] / np.maximum(denom[idx], 1e-12)
    assert (np.abs(s_star) > c).any()
    assert np.all(np.abs(s) <= c + 1e-6)


@pytest.mark.parametrize("kind", ["speechlike", "modtones"])
@pytest.mark.parametrize("search", ["exact", "coarse"])
def test_damped_profile_beats_piecewise_constant_bound(kind, search):
    """Encode with objective='damped', decode with s_damping>0: round-trip
    SNR must exceed the piecewise-constant decode bound — the ceiling the
    default profile sits AT — by a wide margin, at unchanged rate (same
    record count/sizes; the container is byte-compatible either way)."""
    sig, sr = _fixture(kind)
    rec, dom, nr, rs, *_ = compress_audio_arrays(
        sig, sr, 2, tile_size=1024, objective="damped", search=search
    )
    recon = decompress_audio(
        rec, dom, nr, rs, original_len=len(sig), s_damping=0.25
    )
    snr = compute_snr(sig, recon)
    bound = _pc_bound_db(sig, rs)
    assert snr > bound + 5.0, (snr, bound)
    # the same file still decodes sanely with the reference-default decoder
    d0 = decompress_audio(rec, dom, nr, rs, original_len=len(sig))
    assert compute_snr(sig, d0) > bound - 2.0


def test_damped_profile_beats_default_profile_under_damped_decode():
    sig, sr = _fixture("speechlike")
    out = {}
    for obj in ("balanced", "damped"):
        rec, dom, nr, rs, *_ = compress_audio_arrays(
            sig, sr, 2, tile_size=1024, objective=obj
        )
        recon = decompress_audio(
            rec, dom, nr, rs, original_len=len(sig), s_damping=0.25
        )
        out[obj] = compute_snr(sig, recon)
    assert out["damped"] > out["balanced"] + 10.0, out


def test_cli_profile_damped(tmp_path):
    """compress --profile damped + decompress --damping realizes the
    quality win end to end through the CLI; default CLI behavior is
    untouched (plain compress == --profile default)."""
    from fwav_tpu.cli import main
    from fwav_tpu.io.wav import read_wav_mono, write_wav

    sig, sr = _fixture("speechlike")
    wav = tmp_path / "in.wav"
    write_wav(wav, sig, sr, 2)

    f_def = tmp_path / "default.fwav"
    f_dmp = tmp_path / "damped.fwav"
    assert main(["compress", str(wav), str(f_def)]) == 0
    assert main(["compress", str(wav), str(f_dmp), "--profile", "damped"]) == 0

    o_def = tmp_path / "def.wav"
    o_dmp = tmp_path / "dmp.wav"
    assert main(["decompress", str(f_def), "--out", str(o_def),
                 "--damping", "0.25"]) == 0
    assert main(["decompress", str(f_dmp), "--out", str(o_dmp),
                 "--damping", "0.25"]) == 0
    a, _, _ = read_wav_mono(o_def)
    b, _, _ = read_wav_mono(o_dmp)
    assert compute_snr(sig, b) > compute_snr(sig, a) + 10.0

    # profile must not change the DEFAULT-decode contract class: the damped
    # file still decodes with damping=0
    o0 = tmp_path / "dmp0.wav"
    assert main(["decompress", str(f_dmp), "--out", str(o0)]) == 0
    c, _, _ = read_wav_mono(o0)
    assert compute_snr(sig, c) > 4.0


def test_damped_profile_survives_compact_container(tmp_path):
    """The damped decode consumes the STORED s (fp16 in compact v2), so the
    compact container must not meaningfully dent the profile's quality
    (measured -0.007 dB on this fixture)."""
    from fwav_tpu.io.compact import (
        load_compressed_compact,
        save_compressed_compact,
    )
    from fwav_tpu.models.encode import prune_bank

    sig, sr = _fixture("speechlike")
    rec, dom, nr, rs, tile, step, thr, olen = compress_audio_arrays(
        sig, sr, 2, objective="damped"
    )
    direct = compute_snr(sig, decompress_audio(
        rec, dom, nr, rs, original_len=olen, s_damping=0.25
    ))
    rec_p, bank_p = prune_bank(rec, dom)
    p = tmp_path / "d.fwav"
    save_compressed_compact(p, rec_p, bank_p, rs, sr, 2, tile, step, thr, olen)
    r2, d2, n2, rs2, *_, ol2 = load_compressed_compact(p)
    via_v2 = compute_snr(sig, decompress_audio(
        r2, d2, n2, rs2, original_len=ol2, s_damping=0.25
    ))
    assert via_v2 > direct - 0.1, (via_v2, direct)
    assert via_v2 > 40.0
