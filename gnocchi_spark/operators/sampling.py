"""Deterministic stratified sampling for training-data pipelines.

A corpus job rarely wants a uniform random sample; it wants "k
documents per language / source / quality band", reproducibly.  Random
sampling is not replayable across runs and engines, so the sample key
is a content-independent hash of the document id (md5) — a uniform,
deterministic total order every SQL engine can reproduce.

Scale shape: a naive ``row_number() OVER (PARTITION BY stratum)`` sends
EVERY row of a stratum through one task — a billion-row ``en`` stratum
is a single-task stage.  ``stratified_sample`` therefore prunes in two
phases: a salted local top-k per (stratum, input-partition) bounds
every window task at k rows x strata-per-partition, then the global
top-k runs over at most ``k x n_partitions`` survivors per stratum.
Because the final rank is a total order, pruning any superset of the
global top-k is lossless — the result is identical to the naive plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col: Column) -> Column:
    """Uniform deterministic ordering key: md5 of the stringified id."""
    return F.md5(id_col.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per stratum under the md5(id) total order.

    Output = input columns + ``rank_col`` (1-based within stratum).
    Deterministic across runs, partitionings, and engines; skew-proof
    (no stratum ever funnels through a single task before pruning).
    """
    key = sample_key(F.col(id_col))
    strata = [F.col(c) for c in strata_cols]
    # phase 1: local prune — salt the window by the input partition so
    # heavy strata spread across tasks; keeps ≤ k rows per (stratum,
    # partition), a superset of the global top-k
    local = Window.partitionBy(*strata, F.spark_partition_id()).orderBy(
        key, F.col(id_col)
    )
    pruned = (
        df.withColumn("_local_rank", F.row_number().over(local))
        .where(F.col("_local_rank") <= k)
        .drop("_local_rank")
    )
    # phase 2: exact rank over the survivors (≤ k × n_partitions rows
    # per stratum — tiny)
    final = Window.partitionBy(*strata).orderBy(key, F.col(id_col))
    return pruned.withColumn(rank_col, F.row_number().over(final)).where(
        F.col(rank_col) <= k
    )
