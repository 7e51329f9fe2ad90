"""Tunnel overlap probe #2 — answers, in one chip session:
 1. does device_put overlap an IN-FLIGHT dispatch's compute?
 2. do back-to-back chunked device_puts beat one big put (wire pipelining)?
 3. does host work overlap an async device_put (fill chunk k+1 while k flies)?
Run: python /tmp/v/probe_overlap2.py   (axon backend, ~3 min incl. init)
"""
import time
import numpy as np

t00 = time.time()
print("init...", flush=True)
import jax, jax.numpy as jnp
jax.devices()
print(f"backend up in {time.time()-t00:.1f}s", flush=True)

@jax.jit
def burn(x):
    def body(i, a):
        return a @ a * 1e-3 + i * 1e-9
    return jax.lax.fori_loop(0, 60, body, x)

x = jnp.asarray(np.random.default_rng(0).standard_normal((2048, 2048)).astype(np.float32))
payload = (np.arange(460_000) % 1000).astype(np.int16)
K = 4
chunks = np.array_split(payload, K)
jax.block_until_ready(burn(x))
jax.block_until_ready(jax.device_put(payload))

def t_compute():
    t0 = time.perf_counter(); jax.block_until_ready(burn(x)); return time.perf_counter()-t0

def t_put():
    t0 = time.perf_counter(); jax.block_until_ready(jax.device_put(payload)); return time.perf_counter()-t0

def t_put_chunked():
    t0 = time.perf_counter()
    hs = [jax.device_put(c) for c in chunks]
    jax.block_until_ready(hs)
    return time.perf_counter()-t0

def t_serial():
    t0 = time.perf_counter()
    jax.block_until_ready(burn(x))
    jax.block_until_ready(jax.device_put(payload))
    return time.perf_counter()-t0

def t_put_during_dispatch():
    # dispatch compute first (async), put while it runs
    t0 = time.perf_counter()
    y = burn(x)
    d = jax.device_put(payload)
    jax.block_until_ready((y, d))
    return time.perf_counter()-t0

def t_dispatch_during_put():
    t0 = time.perf_counter()
    d = jax.device_put(payload)
    y = burn(x)
    jax.block_until_ready((y, d))
    return time.perf_counter()-t0

def t_host_during_put():
    # async put, then host work of ~put duration, then sync
    t0 = time.perf_counter()
    d = jax.device_put(payload)
    acc = 0.0
    z = np.random.default_rng(1).standard_normal(2_000_000).astype(np.float32)
    acc += float(z.sum())
    jax.block_until_ready(d)
    return time.perf_counter()-t0

names = [("compute", t_compute), ("put_1big", t_put),
         ("put_4chunks", t_put_chunked), ("serial", t_serial),
         ("put_during_dispatch", t_put_during_dispatch),
         ("dispatch_during_put", t_dispatch_during_put),
         ("host_during_put", t_host_during_put)]
for name, f in names:
    ts = [f() for _ in range(8)]
    print(f"{name:20s} min {min(ts)*1e3:7.2f} ms  med {sorted(ts)[4]*1e3:7.2f} ms", flush=True)

# ---- production A/B: the real bench encode with h2d_chunks in {1, 2, 4} ----
# Interleaved rounds cancel tunnel phase drift; min-of-N per arm is the
# transport-honest statistic. This decides EncoderConfig.h2d_chunks' auto
# default (records are bit-equal across arms by construction, so the knob is
# purely a transport choice).
import sys
sys.path.insert(0, "/root/repo")
from bench import make_signal
from fwav_tpu import compress_audio_arrays
from fwav_tpu.config import EncoderConfig

sig = make_signal(10.0, 44100)
arms = {k: EncoderConfig(h2d_chunks=k) for k in (1, 2, 4)}
for k, cfg in arms.items():  # compile each arm's program
    compress_audio_arrays(sig, 44100, 2, config=cfg)
times = {k: [] for k in arms}
for _ in range(10):
    for k, cfg in arms.items():
        t0 = time.perf_counter()
        compress_audio_arrays(sig, 44100, 2, config=cfg)
        times[k].append(time.perf_counter() - t0)
for k, ts in times.items():
    print(f"encode h2d_chunks={k}  min {min(ts)*1e3:7.2f} ms  "
          f"med {sorted(ts)[len(ts)//2]*1e3:7.2f} ms", flush=True)
print("DONE", flush=True)
