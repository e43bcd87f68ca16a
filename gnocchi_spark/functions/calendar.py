"""Calendar groupings & extracts (reference ``gnocchi/calendar.py:19-100``).

Gnocchi's calendar granularities are non-uniform buckets keyed
``Y/H/Q/M/W`` (GROUPINGS, calendar.py:95-100); each maps to a bucket
*start timestamp*:

- ``Y``/``Q``/``M``: plain ``date_trunc``
- ``H`` (half-year): first day of Jan/Jul — no Spark builtin, tiny
  month arithmetic expression
- ``W``: weeks grouped **on Sunday** (week_and_year, calendar.py:40-44
  — the +4d/-4d datetime64[W] trick lands on Sunday starts), which is
  NOT ISO ``date_trunc('week')``; implemented via dayofweek offset.

The scalar extracts (calendar.py:19-92) map to builtins, except
day_of_week which is Sunday(0)..Saturday(6) — Spark's ``dayofweek`` is
Sunday(1)..Saturday(7), so shift by one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_calendar(ts: Column, grouping: str) -> Column:
    """Bucket-start timestamp for calendar grouping Y/H/Q/M/W."""
    g = grouping.upper()
    if g == "Y":
        return F.date_trunc("year", ts)
    if g == "Q":
        return F.date_trunc("quarter", ts)
    if g == "M":
        return F.date_trunc("month", ts)
    if g == "H":
        # half_and_year (calendar.py:81-84): Jan 1 or Jul 1
        half_month = (((F.month(ts) - 1) / 6).cast("int") * 6 + 1).cast("int")
        return F.make_timestamp(
            F.year(ts), half_month, F.lit(1), F.lit(0), F.lit(0), F.lit(0)
        )
    if g == "W":
        # week_and_year (calendar.py:40-44): Sunday-start weeks
        return F.date_sub(ts.cast("date"), F.dayofweek(ts) - 1).cast("timestamp")
    raise ValueError(f"unknown calendar grouping {grouping!r}")


def month_of_year(ts: Column) -> Column:
    return F.month(ts)


def iso_week_of_year(ts: Column) -> Column:
    return F.weekofyear(ts)


def day_of_year(ts: Column) -> Column:
    # reference is 0-based (datetime64 difference, calendar.py:47-50)
    return F.dayofyear(ts) - 1


def day_of_month(ts: Column) -> Column:
    return F.dayofmonth(ts)


def day_of_week(ts: Column) -> Column:
    """Sunday(0) .. Saturday(6), calendar.py:59-62."""
    return F.dayofweek(ts) - 1


def quarter_of_year(ts: Column) -> Column:
    return F.quarter(ts)


def half_of_year(ts: Column) -> Column:
    return ((F.month(ts) - 1) / 6).cast("int") + 1


def year(ts: Column) -> Column:
    return F.year(ts)
