"""Logging + startup banner.

The reference prints a CPU/GPU capability banner at import (fractal.py:48-57).
We do the TPU equivalent lazily (JAX device discovery is not free) and never
at import time.
"""

from __future__ import annotations

import logging

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s: %(message)s")
logger = logging.getLogger("fwavc")

_banner_done = False


def device_banner() -> str:
    """One-line device summary, logged once on first pipeline use."""
    global _banner_done
    import jax

    devs = jax.devices()
    kind = devs[0].platform if devs else "none"
    msg = f"[FWAVC-TPU] backend={kind} devices={len(devs)}"
    if not _banner_done:
        logger.info(msg)
        _banner_done = True
    return msg
