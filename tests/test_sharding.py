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


def test_compress_audio_sharded_matches_single_device(tone):
    """Full multi-chip encode (range-DP over the 8-device mesh) must produce
    the same matches as the single-device exact encoder."""
    from fwav_tpu.models.encode import compress_audio_arrays
    from fwav_tpu.parallel.shard import compress_audio_sharded

    sig, sr, sw = tone
    rec_1, dom_1, n1, rs1, *_ = compress_audio_arrays(
        sig, sr, sw, tile_size=128, search="exact"
    )
    mesh = make_mesh(8, dp=8, tp=1)
    rec_8, dom_8, n8, rs8, *_ = compress_audio_sharded(
        sig, sr, sw, mesh=mesh, tile_size=128
    )
    assert (n8, rs8) == (n1, rs1)
    np.testing.assert_allclose(dom_8, dom_1, atol=1e-5)
    # a pure tone has exactly-tied mirror pairs (domain j reversed == domain
    # k), and ulp-level fusion differences may resolve those ties either way
    # across program partitionings — so compare the MATCH QUALITY, not the
    # tie resolution: fit magnitude, offset and error must agree, and the
    # sentinel sets must be identical.
    np.testing.assert_array_equal(rec_8["idx"] < 0, rec_1["idx"] < 0)
    np.testing.assert_allclose(np.abs(rec_8["s"]), np.abs(rec_1["s"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rec_8["o"], rec_1["o"], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(rec_8["err"], rec_1["err"], rtol=1e-3, atol=1e-2)
    # end to end, the decodes must match
    from fwav_tpu import decompress_audio

    d1 = decompress_audio(rec_1, dom_1, n1, rs1, original_len=len(sig))
    d8 = decompress_audio(rec_8, dom_8, n8, rs8, original_len=len(sig))
    np.testing.assert_allclose(d1, d8, atol=0.1)
