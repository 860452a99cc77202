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

__all__ = ["round_half_away", "to_fixed"]


def to_fixed(x: np.ndarray, scale: int) -> np.ndarray:
    """Quantize doubles to int64 fixed-point with DuckDB ``round()``
    (half-away) tie semantics: the oracle-side twin of
    ``CAST(round(x * scale) AS BIGINT)``.

    Kernels across this repo quantize with ``np.rint(x * scale)``
    (half-to-even), which agrees with this function on every input the
    generated tables can produce: the value/price/balance columns are
    2-decimal decimals and quantile bounds are pre-rounded to 6
    decimals, so ``x * scale`` is always within one ulp of an integer
    and never lands on an exact .5 tie
    (``tests/test_query_props.py::test_rint_equals_half_away_on_decimal_domains``
    pins this). New kernels quantizing inputs NOT known to be
    tie-free should call this helper instead of ``np.rint``.
    """
    return round_half_away(
        np.asarray(x, dtype=np.float64) * np.float64(scale), 0
    ).astype(np.int64)


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
