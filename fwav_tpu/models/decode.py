"""Decode engine: decompress_audio (reference: fractal.py:1378-1473).

Iterative fractal reconstruction as a jitted lax.while_loop. Per-iteration
semantics match the reference exactly:

- -1 sentinel rows contribute nothing: tiles/s/o/sym zeroed (fractal.py:1398-1426);
- tiles mirrored where sym (fractal.py:1428-1429);
- scale is RE-FIT against the evolving reconstruction each iteration; with
  the default s_damping=0 the stored s is used only where the tile has ~zero
  centered energy (fractal.py:1437-1445), with s_damping>0 the blend is
  (1-d)*s_stored + d*s_opt;
- s clipped to +/- s_clip AFTER selection; offset is always the stored o
  (fractal.py:1446-1449);
- scatter-average: live ranges never overlap, so the reference's
  bincount-average (fractal.py:1451-1458) reduces to a reshape — we fuse it;
- convergence: relative delta ||next - prev|| / max(||prev||, treated-as-1-
  when-zero) < eps breaks AFTER the update (fractal.py:1460-1467).

Loop-invariant work (gather, mirror, centering, denominators) is hoisted out
of the loop — the reference recomputes it every iteration; results are
identical because the domain bank and the match table never change.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..io.container import MATCH_DTYPE, matches_to_struct
from ..utils.buckets import bucket

_DENOM_EPS = 1e-12  # fractal.py:1409


@lru_cache(maxsize=64)
def _decode_core(
    mb: int,
    db: int,
    range_size: int,
    iterations: int,
    s_clip: float,
    s_damping: float,
):
    n = range_size

    def core(idx, s_stored, o_stored, sym, bank, convergence_eps):
        invalid = idx < 0
        safe = jnp.where(invalid, 0, idx)
        tiles = bank[safe]                                   # (mb, n)
        tiles = jnp.where(invalid[:, None], 0.0, tiles)
        s_st = jnp.where(invalid, 0.0, s_stored)
        o_st = jnp.where(invalid, 0.0, o_stored)
        symb = jnp.where(invalid, False, sym.astype(bool))

        tiles = jnp.where(symb[:, None], tiles[:, ::-1], tiles)
        d_mean = jnp.mean(tiles, axis=1)
        d_c = tiles - d_mean[:, None]
        denom = jnp.sum(d_c * d_c, axis=1)
        valid = denom > _DENOM_EPS

        def body(state):
            it, recon, _ = state
            rr = recon.reshape(mb, n)
            r_mean = jnp.mean(rr, axis=1)
            r_c = rr - r_mean[:, None]
            num = jnp.sum(r_c * d_c, axis=1)
            s_opt = jnp.where(valid, num / jnp.where(valid, denom, 1.0), 0.0)
            if s_damping > 0:
                s_used = (1.0 - s_damping) * s_st + s_damping * s_opt
            else:
                s_used = jnp.where(valid, s_opt, s_st)
            s_used = jnp.clip(s_used, -abs(s_clip), abs(s_clip))
            transformed = s_used[:, None] * tiles + o_st[:, None]
            recon_next = transformed.reshape(-1)
            prev_norm = jnp.linalg.norm(recon)
            denom_norm = jnp.where(prev_norm > 0, prev_norm, 1.0)
            delta = jnp.linalg.norm(recon_next - recon) / denom_norm
            return it + 1, recon_next, delta

        def cond(state):
            it, _, delta = state
            return (it < iterations) & (delta >= convergence_eps)

        init = (jnp.int32(0), jnp.zeros(mb * n, jnp.float32), jnp.float32(jnp.inf))
        it, recon, delta = jax.lax.while_loop(cond, body, init)
        return recon, it, delta

    return jax.jit(core)


def decompress_audio(
    matches,
    domains_array,
    n_ranges,
    range_size,
    iterations: int = 8,
    convergence_eps: float = 1e-3,
    use_gpu: bool = False,
    original_len=None,
    s_clip: float = 16.0,
    s_damping: float = 0.0,
):
    """Reference-shaped decode (fractal.py:1378 signature). `matches` may be
    a tuple list, a dict of arrays, or a packed record array; `use_gpu` is
    accepted for API parity (the device is whatever JAX selected)."""
    del use_gpu
    n_ranges = int(n_ranges)
    range_size = int(range_size)
    if n_ranges == 0:
        out_len = int(original_len) if original_len is not None else 0
        return np.zeros(out_len, dtype=np.float32)

    rec = matches_to_struct(matches)
    assert len(rec) == n_ranges, (len(rec), n_ranges)
    domains = np.ascontiguousarray(np.asarray(domains_array, dtype=np.float32))
    n_domains = len(domains)

    mb = bucket(n_ranges, 256)
    db = bucket(max(n_domains, 1), 256)

    idx = np.full(mb, -1, dtype=np.int32)
    idx[:n_ranges] = rec["idx"]
    if n_domains:
        # clamp any out-of-range stored index like the reference's gather would fail;
        # -1 handling happens on device
        idx[:n_ranges] = np.where(
            rec["idx"] >= n_domains, n_domains - 1, rec["idx"]
        )
    s = np.zeros(mb, np.float32)
    s[:n_ranges] = rec["s"]
    o = np.zeros(mb, np.float32)
    o[:n_ranges] = rec["o"]
    sym = np.zeros(mb, np.uint8)
    sym[:n_ranges] = rec["sym"]
    bank = np.zeros((db, range_size), np.float32)
    bank[:n_domains] = domains

    core = _decode_core(mb, db, range_size, int(iterations), float(s_clip), float(s_damping))
    from .encode import DEVICE_LOCK

    with DEVICE_LOCK:
        recon, _, _ = core(
            jnp.asarray(idx), jnp.asarray(s), jnp.asarray(o), jnp.asarray(sym),
            jnp.asarray(bank), jnp.float32(convergence_eps),
        )
        recon = np.asarray(jax.device_get(recon))[: n_ranges * range_size]
    if original_len is not None:
        recon = recon[: int(original_len)]
    return recon
