"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware (SURVEY.md §4). Must run
before the first jax import."""

import os

# Force, don't setdefault: this environment's sitecustomize registers the
# axon (real-TPU tunnel) PJRT plugin and overrides JAX_PLATFORMS after env
# parsing, so the env var alone is not enough — set the config directly.
# Unit tests must run on the virtual 8-device CPU mesh; real-chip behavior
# is covered by bench.py and the driver's entry checks.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 8:  # the XLA_FLAGS path didn't apply either
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def tone():
    """The reference e2e fixture: 0.12 s, 440 Hz, 8 kHz sine at half of
    int16 full scale (reference: test_e2e.py:6-10)."""
    sr = 8000
    t = np.linspace(0, 0.12, int(sr * 0.12), endpoint=False)
    amp = 0.5 * (2**15 - 1)
    sig = (amp * np.sin(2 * np.pi * 440.0 * t)).astype(np.int16)
    return sig.astype(np.float32), sr, 2


@pytest.fixture
def speechlike():
    """A longer, richer signal: chirp + harmonics + silence gaps, 16 kHz."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * 1.0)) / sr
    sig = 0.4 * np.sin(2 * np.pi * (200 + 300 * t) * t)
    sig += 0.2 * np.sin(2 * np.pi * 800 * t)
    sig += 0.01 * rng.standard_normal(len(t))
    # carve silence gaps
    sig[int(0.3 * sr) : int(0.4 * sr)] = 0.0
    sig[int(0.7 * sr) : int(0.78 * sr)] = 0.0
    return (sig * 0.5 * (2**15 - 1)).astype(np.float32), sr, 2
