"""Static-shape bucketing.

Everything under jit must have static shapes; audio lengths, range counts and
domain counts are data-dependent. We pad each to the next size on a
{4m, 5m, 6m, 7m}*2^k grid (quarter-octave steps: worst-case 25%, average
~12% over-compute, bounded compile count) and mask the tail. The reference's
-1-sentinel / inf-error masking conventions (fractal.py:544-552, 816-817,
1398-1404) supply the masking semantics for padded rows. Every grid value
>= 4m keeps a power-of-two factor >= m/4·2^k, so the pow2 block divisors the
search kernels rely on stay large.
"""

from __future__ import annotations


def bucket(n: int, minimum: int = 256) -> int:
    """Smallest value >= max(n, 1) from the grid {4, 5, 6, 7} * (minimum/4)
    * 2^k with m = `minimum` (a power of two >= 4)."""
    if n <= minimum:
        return minimum
    b = minimum
    while True:
        for num in (5, 6, 7):
            c = (b // 4) * num
            if c >= n:
                return c
        b *= 2
        if b >= n:
            return b


def pad_to(n: int, multiple: int) -> int:
    """Round up to a multiple."""
    return ((n + multiple - 1) // multiple) * multiple
