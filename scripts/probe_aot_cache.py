#!/usr/bin/env python
"""Chip-time probe: can compiled executables be reused across PROCESSES on
the axon PJRT? (VERDICT r4 item 7 — the JAX persistent compilation cache
measured as a no-op for axon executables in round 3/4, so every process
pays the full encode-core compile, 90 s - 8 min per tunnel phase.)

Two candidate mechanisms, probed independently against the REAL bench-shape
encode core (models.encode.build_encode_core):

1. jax.experimental.serialize_executable.{serialize,deserialize_and_load}:
   pickles the loaded PJRT executable — the only path that truly skips
   XLA compilation at load. If the plugin implements executable
   serialization, a tiny disk cache ends the per-process compile tax.
2. jax.export: serializes lowered StableHLO. Loading still COMPILES, so it
   can only help if compile-from-stablehlo is materially cheaper than
   trace+lower+compile (it usually is not for this program; measured here
   to close the question with a number).

Run on the real chip (takes one full cold compile). Writes one JSON line;
exit 0 even when both mechanisms fail — the measurement is the deliverable.

Usage: timeout 1800 python scripts/probe_aot_cache.py
       python scripts/probe_aot_cache.py --reload PATH   (internal: fresh-
       process half of mechanism 1 — deserialize PATH, run one step, no
       compile; spawned automatically when in-process serialization works)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench_prep(seconds):
    """The bench fixture's padded inputs + core key, via the production
    prep path so the probe compiles exactly the program the CLI runs."""
    from bench import make_signal
    from fwav_tpu.config import EncoderConfig
    from fwav_tpu.models import encode as enc

    sig = make_signal(seconds, 44100)
    cfg = EncoderConfig()
    prep = enc._prep_signal(sig, cfg)
    return sig, cfg, prep


def main():
    t_start = time.time()
    import jax

    if "--cpu" in sys.argv:
        # CPU validation mode (and its --reload child): the env var path is
        # unreliable on this rig (sitecustomize re-registers axon), only
        # the in-process config update sticks
        jax.config.update("jax_platforms", "cpu")

    from fwav_tpu.models import encode as enc

    if "--reload" in sys.argv:
        # fresh process: load the pickled executable and run one step. Any
        # compile here would show up as wall time; the parent compares.
        import pickle

        from jax.experimental import serialize_executable as se

        path = sys.argv[sys.argv.index("--reload") + 1]
        with open(path, "rb") as f:
            payload, in_tree, out_tree, raw_p, meta = pickle.load(f)
        t0 = time.time()
        reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
        t_load = time.time() - t0
        import jax.numpy as jnp

        t0 = time.time()
        np.asarray(jax.device_get(reloaded(jnp.asarray(raw_p),
                                           jnp.asarray(meta))))
        print(json.dumps({
            "reload_deserialize_s": round(t_load, 2),
            "reload_run_s": round(time.time() - t0, 2),
            "reload_total_s": round(time.time() - t_start, 1),
        }), flush=True)
        return

    # CPU validation shrinks the fixture (the mechanism check is shape-
    # independent); the chip run probes the true bench shape
    sig, cfg, prep = _bench_prep(1.0 if "--cpu" in sys.argv else 10.0)
    raw_p, meta, key, n_ranges, n_domains = prep
    import jax.numpy as jnp

    # plain jit (not enc._encode_core): the probe needs .lower()/.compile(),
    # and the production core may be wrapped by utils/aot_cache.cached_jit
    f = jax.jit(enc.build_encode_core(*key))
    args = (jnp.asarray(raw_p), jnp.asarray(meta))

    t0 = time.time()
    lowered = f.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    np.asarray(jax.device_get(compiled(*args)))
    t_run = time.time() - t0

    out = {
        "backend": jax.default_backend(),
        "t_lower_s": round(t_lower, 2),
        "t_compile_s": round(t_compile, 2),
        "t_first_run_s": round(t_run, 2),
    }

    # mechanism 1: executable serialization (the real prize)
    try:
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        out["exec_serialize_s"] = round(time.time() - t0, 2)
        out["exec_payload_mb"] = round(len(payload) / 1e6, 2)
        t0 = time.time()
        reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
        out["exec_deserialize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        a = np.asarray(jax.device_get(reloaded(*args)))
        out["exec_reload_run_s"] = round(time.time() - t0, 2)
        b = np.asarray(jax.device_get(compiled(*args)))
        out["exec_reload_bit_equal"] = bool(np.array_equal(a, b))
        out["exec_serialization"] = "ok"

        # the cross-PROCESS half: a fresh interpreter must be able to load
        # the pickle and run without compiling (this is the scenario that
        # matters — the per-process compile tax)
        import pickle
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".exe.pkl",
                                         delete=False) as tf:
            pickle.dump((payload, in_tree, out_tree, raw_p, meta), tf)
            tmp = tf.name
        try:
            child = [sys.executable, os.path.abspath(__file__),
                     "--reload", tmp]
            if jax.default_backend() == "cpu":
                child.append("--cpu")  # match the parent's backend
            r = subprocess.run(
                child, capture_output=True, text=True, timeout=900,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            if r.returncode == 0 and line.startswith("{"):
                out["cross_process"] = json.loads(line)
            else:
                out["cross_process"] = (
                    f"FAILED rc={r.returncode}: {r.stderr.strip()[-500:]}"
                )
        finally:
            os.unlink(tmp)
    except Exception as e:  # noqa: BLE001 — the verdict IS the deliverable
        out["exec_serialization"] = f"FAILED: {type(e).__name__}: {e}"

    # mechanism 2: jax.export round trip (recompiles at load; timed anyway)
    try:
        from jax import export as jexport

        t0 = time.time()
        exported = jexport.export(f)(*args)
        blob = exported.serialize()
        out["export_serialize_s"] = round(time.time() - t0, 2)
        out["export_blob_mb"] = round(len(blob) / 1e6, 2)
        t0 = time.time()
        rehydrated = jexport.deserialize(blob)
        out["export_deserialize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        np.asarray(jax.device_get(jax.jit(rehydrated.call)(*args)))
        out["export_recompile_run_s"] = round(time.time() - t0, 2)
        out["export"] = "ok"
    except Exception as e:  # noqa: BLE001
        out["export"] = f"FAILED: {type(e).__name__}: {e}"

    out["total_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
