"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in the ``gnocchi_spark`` package (see SURVEY.md
for the operator inventory this covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gnocchi_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Multi-method, multi-granularity archive-policy rollup of the events
    measure stream — the core gnocchi capability (ingest-time
    aggregation, SURVEY.md §2.3) expressed as one cascaded Spark plan.
    """
    from gnocchi_spark.operators.rollup import rollup_policy
    from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem
    from gnocchi_spark.queries import ensure_session_conf
    from gnocchi_spark.tables import events_as_measures

    ensure_session_conf(spark)
    measures = events_as_measures(spark, "/root/testdata/sf0.001")
    policy = ArchivePolicy(
        "medium",
        0,
        (ArchivePolicyItem(300.0, points=10000), ArchivePolicyItem(3600.0, points=10000)),
        frozenset(["mean", "sum", "min", "max", "count", "std", "first", "last"]),
    )
    return rollup_policy(measures, policy, seq_col="seq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers every operator
    family (see queries.CHECK_ORDER; the tail is verified by
    tools/check_oracle.py, full-registry results committed per round
    as ORACLE_FULL_r{N}.txt)."""
    return _q.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get a
    weaker rows-only check)."""
    return dict(_q.ORACLES)
