"""Decimal-safe money arithmetic for cross-engine hash-stable outputs.

Rounded ``double`` aggregates are a hash hazard: Spark's ``round``
goes through BigDecimal HALF_UP while DuckDB rounds in float math, so
on ~1 row in 10⁴ the resulting doubles differ in the final bit —
enough to flip an exact value-hash comparison even though every value
agrees to 9 significant digits (this killed ``window_order_stats`` and
``events_sessionize`` in round 1).

The fix: never hash a rounded double.  Money columns are converted to
**integer cents** at the scan (``round(x*100)`` of a value that is a
2-decimal quantity stored as a double is exact: x*100 sits within one
ulp of an integer, nowhere near a .5 boundary), and every downstream
sum/lag/min/max stays in exact int64 arithmetic that both engines
reproduce bit-for-bit.  Ratios (averages) are emitted as
``floor(exact_int / exact_int)`` — IEEE division of the same exact
integers is identical everywhere, and ``floor`` has no half-way case.

The same trick at 4 decimals is ``basis points`` (see
text_analysis.quality_scores, round 1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


#: DuckDB twin of :func:`cents` — format with the column expression.
SQL_CENTS = "CAST(round(({expr}) * 100) AS BIGINT)"
