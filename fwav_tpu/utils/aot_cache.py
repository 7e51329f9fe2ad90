"""Opt-in cross-process executable cache (FWAV_EXEC_CACHE=dir).

The round-3/4 measurement: JAX's persistent compilation cache is a no-op
for axon-compiled executables, so every CLI process pays the full encode
core compile (90 s - 8 min per tunnel phase; the 30-minute fixture encodes
at 13.4x cold vs 172x warm decode, PARITY.md). The reference has no analog
problem only because it has no compiler (CuPy kernels, fractal.py:637-754).

`jax.experimental.serialize_executable` pickles the LOADED PJRT
executable — the only mechanism that truly skips XLA compilation at load
(jax.export stores StableHLO and recompiles). When the plugin supports it
(CPU does: 0.3 s reload vs 7.4 s trace+compile measured by
scripts/probe_aot_cache.py, which probes the axon PJRT as chip-queue
job 4), a content-keyed disk cache ends the per-process compile tax.

Key = SHA-256 of (jax version, backend platform, device kind, device
count, the lowered StableHLO text). The StableHLO hash keys the exact
program — shapes, constants, config-derived structure — so a hit IS the
same computation; the platform/device fields keep executables from
crossing backends or topologies. EVERY failure mode (serialization
unsupported by the plugin, corrupt or truncated cache file, version
drift) falls back to the normal compile for that call, so the cache can
only skip work, never break an encode; `stats` counts hits/misses/errors
for tests and diagnostics.

Off by default: executables are multi-megabyte and rig-specific, and the
cache dir is trusted local state (entries are pickles — point
FWAV_EXEC_CACHE only at a directory you own, same trust model as JAX's
own compilation cache).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
import threading

logger = logging.getLogger("fwavc")

#: Live counters (per process): cross-process disk hits, compiles that
#: populated the cache, compiles that could not be serialized, errors that
#: fell back to the plain jitted path.
stats = {"hits": 0, "misses": 0, "unserializable": 0, "errors": 0}


def cache_dir():
    """The active cache directory, or None (feature off)."""
    d = os.environ.get("FWAV_EXEC_CACHE")
    return d or None


def _arg_sig(args):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = []
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        if shape is not None:
            sig.append((tuple(shape), str(getattr(leaf, "dtype", ""))))
        else:
            sig.append(("py", repr(leaf)))
    return (treedef, tuple(sig))


def _load_or_compile(jitted, args, d):
    """AOT half: lower, key on the StableHLO, reload a serialized
    executable on a key hit, else compile and (best-effort) persist.
    Returns (fn, reloaded_from_disk)."""
    import jax

    lowered = jitted.lower(*args)
    dev = jax.devices()[0]
    try:  # backend identity beyond the platform name (e.g. runtime build)
        pv = dev.client.platform_version
    except Exception:  # noqa: BLE001
        pv = ""
    meta = (
        f"{jax.__version__}|{dev.platform}|{dev.device_kind}|{pv}"
        f"|{jax.device_count()}|"
    ).encode()
    key = hashlib.sha256(meta + lowered.as_text().encode()).hexdigest()
    path = os.path.join(d, key[:32] + ".fwexec")

    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            stats["hits"] += 1
            logger.info("exec-cache hit: %s", os.path.basename(path))
            return loaded, True
        except Exception:  # noqa: BLE001 — corrupt/foreign entry: recompile
            stats["errors"] += 1
            logger.warning("exec-cache entry unusable, recompiling: %s", path)

    compiled = lowered.compile()
    try:
        from jax.experimental import serialize_executable as se

        blob = pickle.dumps(se.serialize(compiled))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic: readers never see a partial file
        except BaseException:
            os.unlink(tmp)
            raise
        stats["misses"] += 1
    except Exception:  # noqa: BLE001 — plugin without executable serialization
        stats["unserializable"] += 1
        logger.info("exec-cache: backend cannot serialize executables")
    return compiled, False


def cached_jit(fun, **jit_kwargs):
    """jax.jit with a cross-process executable cache when FWAV_EXEC_CACHE
    is set; plain jax.jit otherwise (zero overhead — the env var is read
    per call so tests can toggle it). Shape-polymorphic like jit: each
    distinct argument signature keys its own executable."""
    import jax

    jitted = jax.jit(fun, **jit_kwargs)
    compiled = {}
    lock = threading.Lock()

    def call(*args):
        d = cache_dir()
        if not d:
            return jitted(*args)
        try:
            sig = _arg_sig(args)
        except Exception:  # noqa: BLE001
            stats["errors"] += 1
            return jitted(*args)
        fn = compiled.get(sig)
        if fn is None:
            with lock:
                fn = compiled.get(sig)
                if fn is None:
                    try:
                        fn, reloaded = _load_or_compile(jitted, args, d)
                    except Exception:  # noqa: BLE001 — never block the encode
                        stats["errors"] += 1
                        logger.warning("exec-cache failed, using plain jit",
                                       exc_info=True)
                        fn, reloaded = jitted, False
                    if reloaded:
                        # runtime guard: a reloaded executable that cannot
                        # EXECUTE here (device-count/topology drift the key
                        # missed, or a machine-feature mismatch on CPU AOT)
                        # permanently drops this signature back to the
                        # plain jit — the cache may only skip work
                        fn = _guard(fn, jitted, compiled, sig)
                    compiled[sig] = fn
        return fn(*args)

    return call


def _guard(loaded, jitted, table, sig):
    def run(*args):
        try:
            return loaded(*args)
        except Exception:  # noqa: BLE001 — see comment at the call site
            stats["errors"] += 1
            logger.warning(
                "exec-cache reloaded executable failed to run; recompiling"
            )
            table[sig] = jitted
            return jitted(*args)

    return run
