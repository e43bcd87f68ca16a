"""Timestamp bucketing helpers.

``round_timestamp(ts, granularity)`` in the reference is integer floor
division on nanoseconds (gnocchi/carbonara.py:68-70).  Spark timestamps
are microsecond-precision; we do the same floor math on ``unix_micros``
so sub-second granularities work exactly.  Calendar (non-uniform)
granularities Y/H/Q/M/W (gnocchi/calendar.py:95-100) map to
``date_trunc`` plus a small expression for half-year.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CALENDAR_GRANULARITIES = {"Y", "H", "Q", "M", "W", "D"}

# gnocchi/calendar.py:95-100 — Y=year, H=half, Q=quarter, M=month, W=week.
_DATE_TRUNC = {"Y": "year", "Q": "quarter", "M": "month", "W": "week", "D": "day"}


def truncate_to_bucket(ts: Column, granularity: float | str) -> Column:
    """Floor ``ts`` to its bucket start for a fixed (seconds) or calendar
    granularity.  Stays a pure Column expression -> whole-stage codegen."""
    if isinstance(granularity, str) and granularity in CALENDAR_GRANULARITIES:
        if granularity == "H":
            # Half-year: truncate to year, add 6 months when month > 6
            # (gnocchi/calendar.py:61-66 half_of_year).
            year_start = F.date_trunc("year", ts)
            return F.when(
                F.month(ts) > 6, year_start + F.expr("INTERVAL 6 MONTHS")
            ).otherwise(year_start)
        return F.date_trunc(_DATE_TRUNC[granularity], ts)
    gran_us = int(round(float(granularity) * 1_000_000))
    if gran_us <= 0:
        raise ValueError(f"granularity must be positive, got {granularity!r}")
    us = F.unix_micros(ts)
    return F.timestamp_micros((us - us % F.lit(gran_us)).cast("long"))


def granularity_label(granularity: float | str) -> str:
    """Stable string label for a granularity, used in rollup keys."""
    if isinstance(granularity, str) and granularity in CALENDAR_GRANULARITIES:
        return granularity
    g = float(granularity)
    return str(int(g)) if g.is_integer() else repr(g)


def granularity_seconds(granularity: float | str) -> float | None:
    """Numeric seconds for fixed granularities, None for calendar ones."""
    if isinstance(granularity, str) and granularity in CALENDAR_GRANULARITIES:
        return None
    return float(granularity)
