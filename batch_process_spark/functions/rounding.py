"""Engine-portable rounding.

Spark's ``round()`` goes through BigDecimal's shortest decimal string
while DuckDB rounds the binary double — at exact decimal midpoints
(common for averages of 2-decimal money over small counts, e.g.
1236.27/24 = 51.51125) the two systematically disagree.
``floor(x*10^s + 0.5)`` is identical IEEE arithmetic in both engines;
use it for every QUOTIENT output (averages, percentiles, ratios) that
an oracle compares. Positive values only (rounds half toward +inf).
The oracle twin is ``floor((expr) * 1e{s} + 0.5) / 1e{s}``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int = 4) -> Column:
    m = 10 ** scale
    return F.floor(col * m + F.lit(0.5)) / m
