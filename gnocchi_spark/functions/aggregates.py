"""Aggregation kernels as built-in Spark aggregate Columns.

Each gnocchi aggregation method (gnocchi/archive_policy.py:39-46,
kernels at gnocchi/carbonara.py:108-221) maps to a native Spark
aggregate expression — JVM-side, partial-aggregated map-side, inside
whole-stage codegen.  No Python UDFs.

Semantic shims mirrored from the reference:

- ``std`` is *sample* std (ddof=1) and buckets with count <= 1 are
  dropped from the output (carbonara.py:173-182) — callers must apply
  :func:`std_having` post-filter.
- ``median`` / ``Npct`` use linear interpolation between closest ranks
  (carbonara.py:197-210), exactly Spark's ``percentile`` (and DuckDB's
  ``quantile_cont``).
- ``first``/``last`` are by timestamp order within the bucket
  (carbonara.py:187-195); ties broken by an optional sequence column so
  results are deterministic.
- ``rate:<m>`` is computed by the caller (rollup) as a per-metric
  ``value - lag(value)`` *before* bucket aggregation
  (carbonara.py:212-221).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gnocchi_spark.policy import parse_method


def agg_expr(
    method: str,
    value: Column | str = "value",
    ts: Column | str = "ts",
    tiebreak: Column | str | None = None,
    exact: bool = False,
) -> Column:
    """Return the aggregate Column for a (non-rate) method.

    ``tiebreak`` (e.g. an event id) makes first/last deterministic when
    several points share a timestamp; gnocchi resolves duplicate
    timestamps before aggregation with last-write-wins
    (carbonara.py:92-105), which the ingest path handles separately.

    ``exact=True`` switches mean/sum to replay-exact arithmetic: each
    value quantizes to floor(x*1e6 + 0.5) (an engine-uniform pure-IEEE
    rounding, exact for inputs with <= 6 fractional digits) and sums
    in DECIMAL(38,0) — integer addition is associative, so the result
    cannot depend on partition scheduling, and the decimal accumulator
    cannot wrap below 1e38 where a LONG sum would silently wrap past
    2^63 in non-ANSI Spark while DuckDB promotes to HUGEINT (r07
    review; quantizing in codegen'd double math first and only casting
    the LONG to decimal for the sum measures at parity with the pure
    long form — the r06 2x regression came from DECIMAL(38,6) VALUE
    arithmetic, not from a decimal accumulator).  Past 2^53 the final
    decimal->double conversion rounds to nearest identically in both
    engines.  Use it when results must be bit-reproducible across
    runs/engines (the oracle-parity query surface); the default double
    partials remain the throughput path for the production rollup
    cascade.
    """
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    base, rate_base, pct = parse_method(method)
    if base == "rate":
        raise ValueError("rate:* must be pre-diffed by the caller (see rollup)")
    if base == "mean":
        if exact:
            return (
                F.sum(
                    F.floor(value * F.lit(1e6) + F.lit(0.5)).cast(
                        "decimal(38,0)"
                    )
                )
                .cast("double")
                / F.lit(1e6)
                / F.count(value)
            )
        return F.avg(value)
    if base == "sum":
        if exact:
            return (
                F.sum(
                    F.floor(value * F.lit(1e6) + F.lit(0.5)).cast(
                        "decimal(38,0)"
                    )
                )
                .cast("double")
                / F.lit(1e6)
            )
        return F.sum(value)
    if base == "min":
        return F.min(value)
    if base == "max":
        return F.max(value)
    if base == "count":
        return F.count(value)
    if base == "std":
        if exact:
            # replay-exact sample std for <=2-dp inputs: quantize each
            # value to an exact integer (x100), take moment sums
            # (associative, order-free), then evaluate the textbook
            # n*S2 - S1^2 form — both engines compute the IDENTICAL
            # cancellation bit-for-bit, which is what the oracle gate
            # needs (the default Welford path stays the ACCURACY choice
            # for production).  The LONG sums alone are NOT wrap-safe at
            # the claimed envelope (n*S2 <= n^2*(100*v)^2 ~ 2.5e21 for
            # 1e5 points of |v|=5e3, ~270x over 2^63, and Spark's
            # non-ANSI LONG arithmetic wraps silently while DuckDB
            # promotes to HUGEINT), so the n*S2 - S1^2 combination runs
            # in DECIMAL(38,0): exact for |S1| < ~1e16 / n*S2 < ~1e37,
            # i.e. any realistic bucket, and identical across engines.
            v100 = F.floor(value * F.lit(100.0) + F.lit(0.5))
            dec = "decimal(38,0)"
            s1 = F.sum(v100.cast(dec))
            # square in DECIMAL: v100 is LONG, and a LONG*LONG square
            # wraps at |v100| > ~3e9 (|value| > ~3e7) BEFORE any cast
            # could widen it — inside the envelope the combination
            # below claims (r07 review finding)
            s2 = F.sum(v100.cast(dec) * v100.cast(dec))
            n = F.count(value).cast(dec)
            return (
                F.sqrt(
                    (n * s2 - s1 * s1).cast("double")
                    / (n * (n - F.lit(1).cast(dec))).cast("double")
                )
                / F.lit(100.0)
            )
        return F.stddev_samp(value)
    if base == "median":
        return F.percentile(value, F.lit(0.5))
    if base == "pct":
        return F.percentile(value, F.lit(pct))
    order = ts if tiebreak is None else F.struct(
        ts, F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    )
    if base == "first":
        return F.min_by(value, order)
    if base == "last":
        return F.max_by(value, order)
    raise ValueError(f"unhandled method {method!r}")


def std_having(count_col: Column) -> Column:
    """Bucket-suppression predicate for std: carbonara.py:180-182 drops
    buckets with a single point (sample std undefined)."""
    return count_col > 1


def safe_alias(method: str) -> str:
    """Column-safe name for a method (``rate:mean`` -> ``rate_mean``)."""
    return method.replace(":", "_")
