"""SQL-compatible rounding for numpy/pandas code paths.

numpy and pandas round half-to-even (banker's rounding); DuckDB's round()
rounds half away from zero on the scaled binary double — round_half_away
below reproduces DuckDB exactly. Any Arrow/numpy operator whose output is
hash-compared against a SQL oracle must use it, or exact .xxx5 values
flip the other way (observed: 13/10000 rows in a mean-centering UDF at
sf0.01).

Spark's F.round is a third mode: HALF_UP on the DECIMAL string
representation of the double (its shortest repr), not on the scaled
binary value. It agrees with DuckDB except on doubles whose shortest
repr terminates with a '5' at the rounding digit while the binary value
sits just below the half (e.g. 0.285 -> Spark 0.29, DuckDB/binary 0.28).
Consequence for oracle parity: wherever an F.round output is
hash-compared and the operand is a computed double (cosine/jaccard/avg),
the hazard is data-dependent; if a fixture ever hits it, replace the
Spark side with sign(x) * floor(abs(x)*scale + 0.5) / scale to match the
scaled-double semantics (this module's formula as a Column expression).
Pass-through parquet doubles are never rounded (bit-exact both sides)."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int):
    """Element-wise round-half-away-from-zero on the scaled binary double
    — bit-matches Spark/DuckDB round() for float64 inputs."""
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def round_half_away_col(c, decimals: int):
    """The Column-expression form of round_half_away — the replacement
    this module's docstring prescribes for F.round wherever a computed
    double is hash-compared and a fixture hits the decimal-tie hazard
    (first observed: quality_score_fast at sf0.1, doc 4719 — raw
    0.27695 rounds 0.277 under Spark's HALF_UP-on-shortest-repr but
    0.2769 under the scaled binary both DuckDB and this formula use).
    floor() returns LONG, so keep operands within int64 after scaling
    (true for every 0..1 score this repo rounds)."""
    import pyspark.sql.functions as F

    scale = 10.0 ** decimals
    return F.signum(c) * F.floor(F.abs(c) * scale + F.lit(0.5)) / scale
