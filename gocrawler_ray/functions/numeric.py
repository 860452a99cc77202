"""Numeric helpers shared by kernels whose outputs are hash-gated
against a DuckDB oracle.

DuckDB's ``round(x, n)`` on DOUBLE rounds halves AWAY from zero
(``std::round`` semantics); ``np.round`` rounds halves to even. The
difference only shows on exact decimal ties — e.g. percent_rank
operands like 1/128 = 0.0078125 → numpy 0.007812, DuckDB 0.007813 —
but any such tie is a hash-gate mismatch, so every rounded column that
crosses the gate must use the helper below."""
from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x: np.ndarray, ndigits: int = 0) -> np.ndarray:
    """Vectorized round-half-away-from-zero, matching DuckDB
    ``round(x, ndigits)`` on DOUBLE (and C ``round()``).

    Uses float64 throughout: scale, add 0.5 toward the sign, truncate.
    The ``nextafter`` guard keeps values just *below* a half (whose
    ``abs+0.5`` would spuriously round up to the next integer in
    binary, e.g. 0.49999999999999994) from being pulled over the tie.
    """
    x = np.asarray(x, dtype=np.float64)
    p = np.float64(10.0) ** ndigits
    y = x * p
    ay = np.abs(y)
    # floor(ay + 0.5), except when ay + 0.5 lands exactly on the next
    # integer only via binary rounding-up of the addition
    shifted = ay + 0.5
    r = np.floor(shifted)
    spurious = (r == shifted) & (ay != r - 0.5)
    r = np.where(spurious, r - 1.0, r)
    out = np.copysign(r, y) / p
    # preserve NaN/inf transparently
    return np.where(np.isfinite(x), out, x)
