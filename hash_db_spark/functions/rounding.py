"""SQL-compatible rounding for numpy/pandas code paths.

numpy and pandas round half-to-even (banker's rounding); Spark's round()
and DuckDB's round() both round half away from zero on the scaled double.
Any Arrow/numpy operator whose output is hash-compared against a SQL
oracle must use this, or exact .xxx5 values flip the other way (observed:
13/10000 rows in a mean-centering UDF at sf0.01)."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int):
    """Element-wise round-half-away-from-zero on the scaled binary double
    — bit-matches Spark/DuckDB round() for float64 inputs."""
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
