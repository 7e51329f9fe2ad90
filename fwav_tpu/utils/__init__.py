from .buckets import bucket, pad_to
from .logging import device_banner, logger
from .metrics import compression_ratio, compute_snr, x_realtime
from .trace import collect_phases, jax_profile, phase

__all__ = [
    "bucket",
    "pad_to",
    "device_banner",
    "logger",
    "compression_ratio",
    "compute_snr",
    "x_realtime",
    "collect_phases",
    "jax_profile",
    "phase",
]
