"""Static-shape bucketing.

Everything under jit must have static shapes; audio lengths, range counts and
domain counts are data-dependent. We pad each to the next size on a
{2^k, 3*2^(k-1)} grid (worst-case 33% over-compute, bounded compile count)
and mask the tail. The reference's -1-sentinel / inf-error masking
conventions (fractal.py:544-552, 816-817, 1398-1404) supply the masking
semantics for padded rows.
"""

from __future__ import annotations


def bucket(n: int, minimum: int = 256) -> int:
    """Smallest value >= max(n, 1) from the grid {m, 1.5m, 2m, 3m, ...} with
    m = `minimum` (a power of two)."""
    if n <= minimum:
        return minimum
    b = minimum
    while b < n:
        b15 = b + b // 2
        if b15 >= n:
            return b15
        b *= 2
    return b


def pad_to(n: int, multiple: int) -> int:
    """Round up to a multiple."""
    return ((n + multiple - 1) // multiple) * multiple
