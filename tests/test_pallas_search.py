"""Pallas fused search kernel vs the lax.scan reference (interpret mode on
the CPU mesh; the compiled path is exercised on hardware by bench/encode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fwav_tpu.ops.affine import affine_stats
from fwav_tpu.ops.pallas_search import exact_search_scan_pallas
from fwav_tpu.ops.search import domain_weights, exact_search_scan


@pytest.mark.parametrize("objective", ["balanced", "affine"])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_scan_matches_reference(objective, seed):
    rng = np.random.default_rng(seed)
    M, D, N = 256, 1024, 4
    r = (rng.standard_normal((M, N)) * 0.3).astype(np.float32)
    bank = (rng.standard_normal((D, N)) * 0.3).astype(np.float32)
    r_c = jnp.asarray(r - r.mean(1, keepdims=True))
    dm, dd = affine_stats(jnp.asarray(bank))
    valid = np.ones(D, bool)
    valid[-37:] = False
    w = domain_weights(dm, dd, N, objective)

    s0, i0, y0 = (np.asarray(x) for x in exact_search_scan(
        r_c, jnp.asarray(bank), dm, dd, jnp.asarray(valid), 256, objective
    ))
    s1, i1, y1 = (np.asarray(x) for x in exact_search_scan_pallas(
        r_c, jnp.asarray(bank.T.copy()), w, jnp.asarray(valid),
        range_block=128, domain_block=256, interpret=True,
    ))
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_pallas_scan_all_invalid():
    rng = np.random.default_rng(2)
    M, D, N = 128, 256, 4
    r_c = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    bank = rng.standard_normal((D, N)).astype(np.float32)
    dm, dd = affine_stats(jnp.asarray(bank))
    w = domain_weights(dm, dd, N, "balanced")
    s, i, y = exact_search_scan_pallas(
        r_c, jnp.asarray(bank.T.copy()), w, jnp.zeros(D, bool),
        range_block=128, domain_block=256, interpret=True,
    )
    assert np.all(np.isneginf(np.asarray(s)))


def test_pallas_blocks_ok_predicate():
    # the Mosaic lowering constraint the encode call sites guard on: last
    # block dim divisible by 128 or equal to D; second-to-last divisible
    # by 8 or equal to M. The real-chip failure this pins: --search coarse
    # on a sub-second file gives a 160-row subsampled bank whose pow2
    # block (32) satisfies neither.
    from fwav_tpu.ops.pallas_search import pallas_blocks_ok

    assert not pallas_blocks_ok(512, 160, 512, 32)    # the observed crash
    assert pallas_blocks_ok(512, 160, 512, 160)       # block == D is fine
    assert pallas_blocks_ok(8192, 20480, 512, 2048)   # the bench shapes
    assert not pallas_blocks_ok(512, 320, 512, 64)    # tiny exact bank
    assert pallas_blocks_ok(4, 2048, 4, 2048)         # block == M is fine


def test_small_bank_coarse_encode_with_pallas_requested():
    # forcing search='coarse' + use_pallas on a tiny file must fall back
    # to the lax.scan path instead of dying in the Mosaic lowering
    import numpy as np

    from fwav_tpu.models.encode import compress_audio_arrays
    from fwav_tpu.config import EncoderConfig

    rng = np.random.default_rng(3)
    t = np.arange(19200) / 16000
    sig = np.round(
        (0.4 * np.sin(2 * np.pi * 330 * t) + 0.01 * rng.standard_normal(len(t)))
        * 16000
    ).astype(np.float32)
    cfg = EncoderConfig(tile_size=1024, search="coarse", use_pallas=True)
    rec, bank, n_ranges, *_ = compress_audio_arrays(sig, 16000, 2, config=cfg)
    assert (rec["idx"] >= 0).any() and n_ranges > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_scan_damped_matches_reference(seed):
    """The clip-aware "damped" objective in the kernel (d_thresh + s_clip
    branch) must reproduce the lax.scan path's selections exactly."""
    from fwav_tpu.ops.search import domain_thresh

    rng = np.random.default_rng(seed)
    M, D, N = 256, 1024, 4
    s_clip = 2.0  # low clip so the linear branch fires often
    r = (rng.standard_normal((M, N)) * 0.5).astype(np.float32)
    bank = (rng.standard_normal((D, N)) * 0.1).astype(np.float32)
    r_c = jnp.asarray(r - r.mean(1, keepdims=True))
    dm, dd = affine_stats(jnp.asarray(bank))
    valid = np.ones(D, bool)
    valid[-37:] = False
    w = domain_weights(dm, dd, N, "damped")
    t = domain_thresh(dd, "damped", s_clip)

    s0, i0, y0 = (np.asarray(x) for x in exact_search_scan(
        r_c, jnp.asarray(bank), dm, dd, jnp.asarray(valid), 256, "damped",
        s_clip=s_clip,
    ))
    s1, i1, y1 = (np.asarray(x) for x in exact_search_scan_pallas(
        r_c, jnp.asarray(bank.T.copy()), w, jnp.asarray(valid),
        range_block=128, domain_block=256, interpret=True,
        d_thresh=t, s_clip=s_clip,
    ))
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    # the low clip must actually exercise the linear branch somewhere
    num_max = np.abs(np.asarray(r_c) @ bank.T).max(1)
    assert (num_max > s_clip * np.asarray(dd)[None, :].max()).any()


def test_refine_window_kernel_matches_dense_oracle():
    """refine_window_pallas (the fused dense-window refine) vs a per-range
    numpy oracle evaluating the same W-position window with the same f32
    gain formula — selections must achieve the oracle's best gain
    (near-ties may legally pick an equal-gain neighbor)."""
    from fwav_tpu.ops.pallas_search import refine_window_pallas

    rng = np.random.default_rng(0)
    stride, B, n = 128, 256, 4
    M, RB = 1024, 512
    dc = 40
    n_valid = dc * stride - 700  # invalid tail exercises the position mask
    sig = rng.standard_normal(dc * stride + n * B + 2048).astype(np.float32)
    means = np.convolve(sig, np.ones(B) / B, mode="valid").astype(np.float32)
    W = stride + stride // 4
    lane0 = stride - W // 2
    Lslice = -(-(lane0 + (W - 1) + (n - 1) * B + 1) // 128) * 128
    Lext = -(-(stride + (dc - 1) * stride + Lslice) // 128) * 128
    ext = np.zeros(Lext, np.float32)
    k = min(len(means), Lext - stride)
    ext[stride : stride + k] = means[:k]

    lobes = rng.integers(0, dc, M).astype(np.int32)
    lobes[::17] = -1  # sentinel lobes stay sentinels
    ranges = (rng.standard_normal((M, n)) * 0.7).astype(np.float32)

    score, idx = refine_window_pallas(
        jnp.asarray(ext).reshape(1, -1), jnp.asarray(lobes),
        jnp.asarray(ranges), n_valid, stride, B, "balanced", RB,
        interpret=True,
    )
    score, idx = np.asarray(score), np.asarray(idx)

    def oracle_best(m):
        lb = lobes[m]
        if lb < 0:
            return -np.inf, 0
        c = lb * stride
        best_g, best_p = -np.inf, 0
        r = ranges[m]
        rc = r - r.mean(dtype=np.float32)
        for t in range(W):
            p = c - W // 2 + t
            if p < 0 or p >= n_valid:
                continue
            row = np.array([means[p + j * B] for j in range(n)], np.float32)
            mn = row.mean(dtype=np.float32)
            d_c = row - mn
            den = np.float32((d_c * d_c).sum()) + np.float32(1e-12)
            no = np.float32((rc * row).sum())
            nm = np.float32((rc[::-1] * row).sum())
            w = (den - n * mn * mn) / (den * den)
            g = max(no * no, nm * nm) * w
            if g > best_g:
                best_g, best_p = g, p
        return best_g, best_p

    mismatches = 0
    for m in range(0, M, 7):
        g, p = oracle_best(m)
        if not np.isfinite(g):
            assert not np.isfinite(score[m]), (m, score[m])
            continue
        if p != idx[m]:
            mismatches += 1
    assert mismatches <= 2, mismatches  # fp near-ties only


def test_refine_window_kernel_damped_objective():
    """The window kernel's clip-aware branch (objective='damped') vs a
    numpy oracle with the same clipped-scale gain."""
    from fwav_tpu.ops.pallas_search import refine_window_pallas

    rng = np.random.default_rng(5)
    stride, B, n, c = 128, 256, 4, 2.0
    M, RB = 512, 256
    dc = 24
    n_valid = dc * stride
    sig = (rng.standard_normal(dc * stride + n * B + 2048) * 0.2).astype(np.float32)
    means = np.convolve(sig, np.ones(B) / B, mode="valid").astype(np.float32)
    W = stride + stride // 4
    lane0 = stride - W // 2
    Lslice = -(-(lane0 + (W - 1) + (n - 1) * B + 1) // 128) * 128
    Lext = -(-(stride + (dc - 1) * stride + Lslice) // 128) * 128
    ext = np.zeros(Lext, np.float32)
    k = min(len(means), Lext - stride)
    ext[stride : stride + k] = means[:k]
    lobes = rng.integers(0, dc, M).astype(np.int32)
    ranges = (rng.standard_normal((M, n)) * 1.5).astype(np.float32)

    score, idx = refine_window_pallas(
        jnp.asarray(ext).reshape(1, -1), jnp.asarray(lobes),
        jnp.asarray(ranges), n_valid, stride, B, "damped", RB,
        interpret=True, s_clip=c,
    )
    score, idx = np.asarray(score), np.asarray(idx)

    clip_fired = 0
    for m in range(0, M, 11):
        lb = lobes[m]
        r = ranges[m]
        rc = (r - r.mean(dtype=np.float32)).astype(np.float64)
        best_g, best_p = -np.inf, 0
        for t in range(W):
            p = lb * stride - W // 2 + t
            if p < 0 or p >= n_valid:
                continue
            row = np.array([means[p + j * B] for j in range(n)], np.float64)
            d_c = row - row.mean()
            den = (d_c * d_c).sum()
            a = max(abs((rc * row).sum()), abs((rc[::-1] * row).sum()))
            g = c * (2 * a - c * den) if a > c * den else a * a / max(den, 1e-12)
            if a > c * den:
                clip_fired += 1
            if g > best_g:
                best_g, best_p = g, p
        # compare achieved f64 gains at the kernel's pick vs the oracle's
        p2 = idx[m]
        row = np.array([means[p2 + j * B] for j in range(n)], np.float64)
        d_c = row - row.mean()
        den = (d_c * d_c).sum()
        a = max(abs((rc * row).sum()), abs((rc[::-1] * row).sum()))
        g2 = c * (2 * a - c * den) if a > c * den else a * a / max(den, 1e-12)
        np.testing.assert_allclose(g2, best_g, rtol=1e-4)
    assert clip_fired > 0  # the linear branch was actually exercised


@pytest.mark.parametrize("damped", [False, True])
def test_topc_scan_kernel_matches_lax_scan(damped):
    """topc_search_scan_pallas vs ops.search.gain_topk_scan: identical
    lobe sets in identical order (same stable tie-break)."""
    from fwav_tpu.ops.pallas_search import topc_search_scan_pallas
    from fwav_tpu.ops.search import domain_thresh, gain_topk_scan

    rng = np.random.default_rng(4)
    M, D, N, C = 256, 1024, 4, 4
    s_clip = 2.0
    r = (rng.standard_normal((M, N)) * 0.5).astype(np.float32)
    bank = (rng.standard_normal((D, N)) * 0.2).astype(np.float32)
    r_c = jnp.asarray(r - r.mean(1, keepdims=True))
    valid = np.ones(D, bool)
    valid[-57:] = False
    dm, dd = affine_stats(jnp.asarray(bank))
    obj = "damped" if damped else "balanced"
    w = domain_weights(dm, dd, N, obj)
    t = domain_thresh(dd, obj, s_clip) if damped else None

    want = np.asarray(gain_topk_scan(
        r_c, jnp.asarray(bank), w, jnp.asarray(valid), C, 256,
        d_thresh=t, s_clip=s_clip if damped else None,
    ))
    got = np.asarray(topc_search_scan_pallas(
        r_c, jnp.asarray(bank.T.copy()), w, jnp.asarray(valid), C,
        range_block=128, domain_block=256, interpret=True,
        d_thresh=t, s_clip=s_clip,
    ))
    np.testing.assert_array_equal(got, want)
