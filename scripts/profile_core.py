#!/usr/bin/env python
"""Decompose the device-side encode core (coarse path) into sub-kernel
timings on the real chip. Measurement tool only."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def mintime(fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_signal
    from fwav_tpu.config import EncoderConfig
    from fwav_tpu.ops.affine import affine_stats
    from fwav_tpu.ops.domains import build_bank_jax, n_domains_for
    from fwav_tpu.ops.search import domain_weights, refine_from_lobes
    from fwav_tpu.ops.vad import voiced_mask_jax
    from fwav_tpu.utils.buckets import bucket

    sr = 44100
    sig = make_signal(10.0, sr)
    cfg = EncoderConfig()
    n = cfg.range_size
    step = cfg.domain_step
    original_len = len(sig)
    n_ranges = -(-original_len // n)
    n_domains = n_domains_for(original_len, cfg.tile_size, step)
    nb = bucket(original_len, 4096)
    lb = bucket(n_ranges, 256) * n
    db = bucket(n_domains, 256)
    mb = lb // n
    stride = 64
    scale = float(np.max(np.abs(sig))) or 1.0
    raw_p = np.zeros(nb, dtype=np.float32)
    raw_p[:original_len] = sig
    raw_p *= np.float32(1 / scale)
    rd = jnp.asarray(raw_p)
    jax.device_get(rd[:1])

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    LAT = mintime(lambda: sync(rd))
    print(f"sync latency: {LAT*1e3:.1f} ms (subtracted below)")

    # 1. bank build
    bank_fn = jax.jit(partial(build_bank_jax, tile_size=cfg.tile_size,
                              range_size=n, domain_step=step, d_bucket=db))
    bank = bank_fn(rd, n_domains=n_domains)
    sync(bank)
    t = mintime(lambda: sync(bank_fn(rd, n_domains=n_domains)))
    print(f"build_bank_jax (db={db}): {(t-LAT)*1e3:.1f} ms")

    # 2. affine stats
    stats_fn = jax.jit(affine_stats)
    d_mean, d_denom = stats_fn(bank)
    sync(d_mean)
    t = mintime(lambda: sync(stats_fn(bank)))
    print(f"affine_stats: {(t-LAT)*1e3:.1f} ms")

    # 3. device VAD
    vad_fn = jax.jit(partial(voiced_mask_jax, frame_size=2 * n), static_argnums=())
    m = vad_fn(rd, original_len, energy_threshold=cfg.energy_thresh / scale**2)
    sync(m)
    t = mintime(lambda: sync(vad_fn(rd, original_len,
                                    energy_threshold=cfg.energy_thresh / scale**2)))
    print(f"voiced_mask_jax: {(t-LAT)*1e3:.1f} ms")

    # 4. coarse pallas scan
    from fwav_tpu.ops.pallas_search import exact_search_scan_pallas

    dc = db // stride
    d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
    wtd = np.zeros(lb, dtype=np.float32)
    wl = min(lb, original_len)
    wtd[:wl] = raw_p[:wl]
    ranges = jnp.asarray(wtd.reshape(mb, n))
    sync(ranges)

    cdblk = 256
    while (dc % cdblk) and cdblk > 1:
        cdblk //= 2

    @jax.jit
    def coarse(ranges, bank, d_mean, d_denom, d_valid):
        w = domain_weights(d_mean, d_denom, n, cfg.objective)
        bank_subT = bank.reshape(dc, stride, n)[:, 0, :].T
        w_sub = w.reshape(dc, stride)[:, 0]
        v_sub = d_valid.reshape(dc, stride)[:, 0]
        r_c = ranges - jnp.mean(ranges, axis=1, keepdims=True)
        score, cidx, bsym = exact_search_scan_pallas(
            r_c, bank_subT, w_sub, v_sub, 512, cdblk)
        return score, cidx, bsym

    out = coarse(ranges, bank, d_mean, d_denom, d_valid)
    sync(out)
    t = mintime(lambda: sync(coarse(ranges, bank, d_mean, d_denom, d_valid)))
    print(f"coarse pallas scan (mb={mb}, dc={dc}, cdblk={cdblk}): {(t-LAT)*1e3:.1f} ms")

    # 5. refine from lobes
    score, cidx, bsym = out

    @jax.jit
    def refine(ranges, bank, d_valid, score, cidx):
        lobes = jnp.where(jnp.isfinite(score), cidx, -1)[:, None]
        return refine_from_lobes(ranges, bank, d_valid, lobes, stride,
                                 cfg.s_clip, cfg.objective)

    out2 = refine(ranges, bank, d_valid, score, cidx)
    sync(out2)
    t = mintime(lambda: sync(refine(ranges, bank, d_valid, score, cidx)))
    print(f"refine_from_lobes: {(t-LAT)*1e3:.1f} ms")

    # 6. full pipeline fused (bank + stats + coarse + refine) for comparison
    @jax.jit
    def full(ranges, raw):
        bank = build_bank_jax(raw, cfg.tile_size, n, step, db, n_domains)
        d_valid = jnp.arange(db, dtype=jnp.int32) < n_domains
        d_mean, d_denom = affine_stats(bank)
        s, ci, bs = coarse.__wrapped__(ranges, bank, d_mean, d_denom, d_valid)
        return refine.__wrapped__(ranges, bank, d_valid, s, ci)

    o3 = full(ranges, rd)
    sync(o3)
    t = mintime(lambda: sync(full(ranges, rd)))
    print(f"fused bank+stats+coarse+refine: {(t-LAT)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
