"""Resource-plane operators: history union view, wildcard metric
matching (SURVEY §1.1, §2.7).

The reference's resource model is SCD-2: the live ``resource`` table
plus a ``resource_history`` revision trail; history-aware queries run
against their union with live rows getting ``revision = -1`` and an
open ``revision_end`` (gnocchi/indexer/sqlalchemy.py:1174-1237).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HISTORY_COLS = ("revision", "revision_start", "revision_end")


def history_union_view(
    resources: DataFrame, resource_history: DataFrame
) -> DataFrame:
    """Live ∪ history with the reference's union-mapper semantics:
    live rows carry ``revision=-1, revision_end=NULL``
    (sqlalchemy.py:1184-1237).  Pure ``unionByName`` — no shuffle; the
    view is a metadata-plane table, always small next to measures."""
    live = resources.withColumn("revision", F.lit(-1)).withColumn(
        "revision_end", F.lit(None).cast("timestamp")
    )
    return live.unionByName(resource_history.select(*live.columns))


def fnmatch_to_rlike(pattern: str) -> str:
    """fnmatch pattern -> Java-compatible anchored regex (the
    reference fnmatches metric names, aggregates/api.py:690-695).

    ``fnmatch.translate`` only anchors the end (``\\Z``); ``rlike`` is
    a substring search, so without ``\\A`` the pattern ``p*`` would
    also match the ``p`` inside ``signup.3``.
    """
    import fnmatch

    return r"\A" + fnmatch.translate(pattern)


def wildcard_metrics(
    metrics: DataFrame, pattern: str, name_col: str = "name"
) -> DataFrame:
    """Metrics whose name matches the wildcard — the semi-join source
    for metric references like ``["metric", "cpu*", "mean"]``
    (aggregates/api.py:684-710)."""
    return metrics.where(F.col(name_col).rlike(fnmatch_to_rlike(pattern)))


def lifespan(started_at: Column, ended_at: Column) -> Column:
    """The virtual ``lifespan`` attribute = ended_at - started_at
    (filter compilation, sqlalchemy.py:1541-1550); open-ended
    resources have NULL lifespan."""
    return ended_at - started_at


def split_creator(creator: Column) -> tuple[Column, Column]:
    """``creator`` packs ``user:project``; the virtual attributes
    created_by_user_id / created_by_project_id split it
    (sqlalchemy.py:1551-1568)."""
    user = F.when(
        creator.contains(":"), F.regexp_extract(creator, r"^([^:]*):", 1)
    ).otherwise(creator)
    project = F.when(
        creator.contains(":"), F.regexp_extract(creator, r":(.*)$", 1)
    ).otherwise(F.lit(""))
    return user, project


def point_in_time(union_view: DataFrame, at) -> DataFrame:
    """Reconstruct resource state as of timestamp ``at`` from the SCD-2
    union view: the one revision per resource whose
    ``[revision_start, revision_end)`` interval covers ``at`` (live
    rows have an open end).  This is the reference's history API read
    ("what did this resource look like at T" —
    gnocchi/indexer/sqlalchemy.py:1174-1237 serves it by filtering the
    revision trail the same way).

    Pure scan predicate — both interval bounds compare against a
    literal, so Catalyst pushes them to the source and revision
    partitions prune; no shuffle, no window.
    """
    t = F.lit(at).cast("timestamp")
    return union_view.where(
        (F.col("revision_start") <= t)
        & (F.col("revision_end").isNull() | (F.col("revision_end") > t))
    )
