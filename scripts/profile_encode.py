#!/usr/bin/env python
"""Decompose the 10 s bench encode into fine-grained stages on the real chip.

Not part of the test suite — a measurement tool for the perf work toward the
100x-realtime north star. Mirrors compress_audio_arrays' internals so each
stage can be timed in isolation (min over reps; the tunnel has heavy-tailed
latency).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def mintime(fn, reps=8):
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
    from fwav_tpu.models.encode import _encode_core, _pow2_divisor
    from fwav_tpu.ops.domains import build_domains_host, n_domains_for
    from fwav_tpu.ops.vad import voiced_detection
    from fwav_tpu.utils.buckets import bucket

    sr = 44100
    sig = make_signal(10.0, sr)
    cfg = EncoderConfig()
    range_size = cfg.range_size
    domain_step = cfg.domain_step

    # --- host prepass ---
    def host_prepass():
        signal = np.ascontiguousarray(np.asarray(sig, dtype=np.float32))
        voiced = voiced_detection(signal, frame_size=range_size * 2,
                                  energy_threshold=cfg.energy_thresh)
        weighted = signal * voiced
        float(np.sum(weighted.astype(np.float64) ** 2))
        return signal, weighted

    print(f"host_prepass(contig+vad+silentcheck): {mintime(host_prepass)*1e3:.1f} ms")

    signal, weighted = host_prepass()
    original_len = len(signal)
    pad_len = (range_size - (original_len % range_size)) % range_size
    if pad_len:
        weighted = np.pad(weighted, (0, pad_len), mode="reflect")
    L = len(weighted)
    n_ranges = L // range_size
    n_domains = n_domains_for(original_len, cfg.tile_size, domain_step)

    scale = float(np.max(np.abs(signal))) or 1.0
    inv = np.float32(1.0 / scale)
    nb = bucket(original_len, 4096)
    lb = bucket(n_ranges, 256) * range_size
    db = bucket(n_domains, 256)
    print(f"shapes: n_ranges={n_ranges} lb={lb} ({lb//range_size}) "
          f"n_domains={n_domains} db={db} nb={nb}")

    def host_pad():
        raw_p = np.zeros(nb, dtype=np.float32)
        raw_p[:original_len] = signal
        raw_p *= inv
        wtd_p = np.zeros(lb, dtype=np.float32)
        wtd_p[:L] = weighted
        wtd_p *= inv
        return raw_p, wtd_p

    print(f"host_pad+scale: {mintime(host_pad)*1e3:.1f} ms")
    raw_p, wtd_p = host_pad()

    block_len = cfg.tile_size // range_size
    stride = min(cfg.coarse_stride, max(1, block_len // 4))
    stride = 1 << (stride.bit_length() - 1)
    search_mode = ("coarse" if db >= max(cfg.auto_coarse_threshold, 256 * stride)
                   and stride > 1 else "exact")
    use_pallas = jax.default_backend() == "tpu"
    core = _encode_core(
        nb, lb, db, cfg.tile_size, range_size, domain_step, search_mode,
        cfg.top_k, cfg.emb_dim, cfg.fast_mode, cfg.s_clip, cfg.domain_block,
        cfg.range_block, cfg.objective, stride, cfg.coarse_topc, use_pallas,
    )
    print(f"search_mode={search_mode} stride={stride} pallas={use_pallas}")
    args = (jnp.int32(original_len), jnp.int32(n_ranges), jnp.int32(n_domains),
            jnp.float32(cfg.energy_thresh / (scale * scale)))

    # warm up compile
    w = jnp.asarray(wtd_p); r = jnp.asarray(raw_p)
    packed = core(w, r, *args)
    np.asarray(jax.device_get(packed))

    # --- H2D ---
    def h2d_wtd():
        x = jnp.asarray(wtd_p)
        jax.device_get(x[:1])  # force the copy to complete
        return x

    def h2d_raw():
        x = jnp.asarray(raw_p)
        jax.device_get(x[:1])
        return x

    print(f"h2d wtd ({wtd_p.nbytes/1e6:.1f} MB, synced): {mintime(h2d_wtd)*1e3:.1f} ms")
    print(f"h2d raw ({raw_p.nbytes/1e6:.1f} MB, synced): {mintime(h2d_raw)*1e3:.1f} ms")
    print(f"h2d tiny scalar (latency floor): {mintime(lambda: jax.device_get(jnp.asarray(np.float32(1.0))))*1e3:.1f} ms")

    # --- dispatch (async return) with device-resident inputs ---
    wd, rd = jnp.asarray(wtd_p), jnp.asarray(raw_p)
    jax.device_get(wd[:1]); jax.device_get(rd[:1])

    def dispatch_only():
        return core(wd, rd, *args)

    print(f"dispatch(call returns, device-resident args): {mintime(dispatch_only)*1e3:.1f} ms")

    # --- compute: dispatch -> tiny sync ---
    def compute_sync():
        p = core(wd, rd, *args)
        jax.device_get(p[:1, :1])

    print(f"dispatch+compute (tiny sync): {mintime(compute_sync)*1e3:.1f} ms")

    # --- compute from host arrays (includes H2D) ---
    def compute_from_host():
        p = core(jnp.asarray(wtd_p), jnp.asarray(raw_p), *args)
        jax.device_get(p[:1, :1])

    print(f"h2d+dispatch+compute (tiny sync): {mintime(compute_from_host)*1e3:.1f} ms")

    # --- D2H of the packed result (device already done) ---
    p = core(wd, rd, *args)
    np.asarray(jax.device_get(p))

    def d2h():
        np.asarray(jax.device_get(p))

    print(f"d2h packed ({4*p.shape[1]*4/1e6:.2f} MB): {mintime(d2h)*1e3:.1f} ms")

    def d2h_row():
        np.asarray(jax.device_get(p[:1]))

    print(f"d2h one row ({p.shape[1]*4/1e6:.2f} MB): {mintime(d2h_row)*1e3:.1f} ms")

    # --- host bank build ---
    print(f"host bank build: {mintime(lambda: build_domains_host(signal, cfg.tile_size, range_size, domain_step))*1e3:.1f} ms")

    # --- end to end (the bench number, for reference) ---
    from fwav_tpu.models.encode import compress_audio_arrays

    def e2e():
        compress_audio_arrays(sig, sr, 2)

    print(f"e2e compress_audio_arrays: {mintime(e2e)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
