"""Multi-chip equivalence on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded search must match the single-device kernel bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fwav_tpu.ops.affine import affine_stats
from fwav_tpu.ops.search import exact_search_block
from fwav_tpu.parallel.mesh import make_mesh
from fwav_tpu.parallel.shard import exact_search_sharded


def _problem(seed, M=64, D=512, N=4):
    rng = np.random.default_rng(seed)
    ranges = rng.standard_normal((M, N)).astype(np.float32)
    bank = rng.standard_normal((D, N)).astype(np.float32)
    valid = np.ones(D, bool)
    valid[-17:] = False  # padded tail rows
    return ranges, bank, valid


def test_devices_available():
    assert len(jax.devices()) >= 8, jax.devices()


@pytest.mark.parametrize("tp", [2, 4, 8])
@pytest.mark.parametrize("objective", ["balanced", "affine"])
def test_bank_sharded_search_matches_single_device(tp, objective):
    ranges, bank, valid = _problem(0)
    mesh = make_mesh(8, dp=8 // tp, tp=tp)

    d_mean, d_denom = affine_stats(jnp.asarray(bank))
    want = [
        np.asarray(x)
        for x in exact_search_block(
            jnp.asarray(ranges), jnp.asarray(bank), d_mean, d_denom,
            jnp.asarray(valid), domain_block=64, s_clip=16.0,
            objective=objective,
        )
    ]
    got = [
        np.asarray(x)
        for x in exact_search_sharded(
            jnp.asarray(ranges), jnp.asarray(bank), jnp.asarray(valid),
            mesh, domain_block=64, s_clip=16.0, objective=objective,
        )
    ]
    np.testing.assert_array_equal(got[0], want[0])          # idx
    np.testing.assert_array_equal(got[3], want[3])          # sym
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)  # s
    np.testing.assert_allclose(got[2], want[2], rtol=1e-6, atol=1e-6)  # o
    np.testing.assert_allclose(got[4], want[4], rtol=1e-5, atol=1e-6)  # err


def test_range_dp_encode_matches_single_device():
    """Range-sharded (dp) execution of the search kernel must be exact: the
    ranges axis is embarrassingly parallel."""
    ranges, bank, valid = _problem(1, M=128, D=256)
    mesh = make_mesh(8, dp=8, tp=1)

    d_mean, d_denom = affine_stats(jnp.asarray(bank))

    def run(r):
        return exact_search_block(
            r, jnp.asarray(bank), d_mean, d_denom, jnp.asarray(valid),
            domain_block=64, s_clip=16.0, objective="balanced",
        )

    want = [np.asarray(x) for x in jax.jit(run)(jnp.asarray(ranges))]

    from jax.sharding import NamedSharding, PartitionSpec as P

    r_sharded = jax.device_put(
        jnp.asarray(ranges), NamedSharding(mesh, P("dp", None))
    )
    got = [np.asarray(x) for x in jax.jit(run)(r_sharded)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_sharded_all_invalid_bank():
    ranges, bank, valid = _problem(2, M=16, D=64)
    valid[:] = False
    mesh = make_mesh(8, dp=4, tp=2)
    idx, s, o, sym, err = exact_search_sharded(
        jnp.asarray(ranges), jnp.asarray(bank), jnp.asarray(valid),
        mesh, domain_block=32,
    )
    assert np.all(np.isinf(np.asarray(err)))


def _noise_fixture():
    """Noise-bearing signal (no mirror ties, unlike a pure tone) with a
    silence gap so sentinel rows are exercised too."""
    rng = np.random.default_rng(3)
    sr = 44100
    t = np.arange(int(sr * 1.2)) / sr
    sig = (
        0.4 * np.sin(2 * np.pi * (200 + 60 * np.sin(2 * np.pi * t)) * t * 3)
        + 0.1 * np.sin(2 * np.pi * 950 * t)
        + 0.02 * rng.standard_normal(len(t))
    )
    sig[10000:12000] = 0.0
    return np.round(sig * 15000).astype(np.float32), sr


@pytest.fixture(scope="module")
def _single_device_records():
    from fwav_tpu.models.encode import compress_audio_arrays

    sig, sr = _noise_fixture()
    out = {}
    for mode in ("coarse", "exact"):
        out[mode] = compress_audio_arrays(sig, sr, 2, search=mode)
    return sig, sr, out


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_compress_audio_sharded_bit_equal_coarse(dp, tp, _single_device_records):
    """Full multi-chip encode — the SAME fused core under shard_map, ranges
    dp-sharded, bank tp-sharded (halo'd coarse refine) — must produce
    BIT-EQUAL records to the single-device encoder on a tie-free fixture:
    only the selection leaves the device and s/o/err come from the shared
    host refit (VERDICT r1 item 4)."""
    from fwav_tpu.parallel.shard import compress_audio_sharded

    sig, sr, single = _single_device_records
    rec_1, dom_1, n1, rs1, *_ = single["coarse"]
    rec_8, dom_8, n8, rs8, *_ = compress_audio_sharded(
        sig, sr, 2, mesh=make_mesh(8, dp=dp, tp=tp), search="coarse"
    )
    assert (n8, rs8) == (n1, rs1)
    np.testing.assert_array_equal(dom_8, dom_1)
    for f in ("idx", "s", "o", "sym", "err"):
        np.testing.assert_array_equal(rec_8[f], rec_1[f], err_msg=f)
    assert (rec_1["idx"] == -1).sum() > 0  # sentinel rows exercised


def test_compress_audio_sharded_bit_equal_exact(_single_device_records):
    from fwav_tpu.parallel.shard import compress_audio_sharded

    sig, sr, single = _single_device_records
    rec_1, dom_1, n1, rs1, *_ = single["exact"]
    rec_8, _, n8, rs8, *_ = compress_audio_sharded(
        sig, sr, 2, mesh=make_mesh(8, dp=2, tp=4), search="exact"
    )
    assert (n8, rs8) == (n1, rs1)
    for f in ("idx", "s", "o", "sym", "err"):
        np.testing.assert_array_equal(rec_8[f], rec_1[f], err_msg=f)


def test_compress_audio_sharded_decodes(_single_device_records):
    """End to end: the sharded encode's records decode identically."""
    from fwav_tpu import compute_snr, decompress_audio
    from fwav_tpu.parallel.shard import compress_audio_sharded

    sig, sr, single = _single_device_records
    rec_1, dom_1, n1, rs1, *_ = single["coarse"]
    rec_8, dom_8, n8, rs8, *_ = compress_audio_sharded(
        sig, sr, 2, mesh=make_mesh(8, dp=4, tp=2), search="coarse"
    )
    d1 = decompress_audio(rec_1, dom_1, n1, rs1, original_len=len(sig))
    d8 = decompress_audio(rec_8, dom_8, n8, rs8, original_len=len(sig))
    np.testing.assert_array_equal(d1, d8)
    assert compute_snr(sig, d8) > 4.0


def test_sharded_damped_decode_matches_single_device(_single_device_records):
    """The damped (device while_loop) decode range-sharded over the dp axis
    must reproduce the single-device decode (VERDICT r1 item 7)."""
    from fwav_tpu import decompress_audio

    from fwav_tpu import compute_snr

    sig, sr, single = _single_device_records
    rec, dom, n, rs, *_ = single["coarse"]
    # with the early break disabled both loops run the same iterations and
    # the per-range math is identical
    d1f = decompress_audio(rec, dom, n, rs, original_len=len(sig),
                           s_damping=0.5, convergence_eps=0.0)
    d8f = decompress_audio(rec, dom, n, rs, original_len=len(sig),
                           s_damping=0.5, convergence_eps=0.0,
                           mesh=make_mesh(8, dp=8, tp=1))
    np.testing.assert_allclose(d8f, d1f, rtol=0, atol=1e-4)
    # with the default eps, the relative-delta early break becomes PER-SHARD
    # (the same documented semantics as the DECODE_SHARD_RANGES chunking):
    # shards may stop at different iteration counts, so only the converged
    # quality is asserted
    d1 = decompress_audio(rec, dom, n, rs, original_len=len(sig),
                          s_damping=0.5)
    d8 = decompress_audio(rec, dom, n, rs, original_len=len(sig),
                          s_damping=0.5, mesh=make_mesh(8, dp=8, tp=1))
    assert abs(compute_snr(sig, d8) - compute_snr(sig, d1)) < 0.05


def test_init_distributed_single_process():
    """Multi-host wrapper smoke (VERDICT r1 item 8): a num_processes=1
    jax.distributed cluster initializes and yields a working mesh. Runs in a
    subprocess because distributed init must precede backend init."""
    import subprocess
    import sys

    code = (
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "from fwav_tpu.parallel.mesh import init_distributed;"
        "mesh = init_distributed('localhost:12321', 1, 0);"
        "assert mesh.devices.size >= 1, mesh;"
        "import jax.numpy as jnp;"
        "assert float(jnp.arange(4.0).sum()) == 6.0;"
        "print('distributed-ok', mesh.shape)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd="/root/repo",
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "distributed-ok" in out.stdout, (out.stdout, out.stderr)
