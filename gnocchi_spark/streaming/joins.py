"""Stream-stream interval join — the streaming twin of
``operators/asof.interval_join_pairs``.

The reference has no streaming join at all (its stream is the measure
ingest path, gnocchi/chef.py); this is Spark-native capability exposed
as a first-class operator: Structured Streaming's stream-stream inner
join with an event-time range condition.  Spark derives the state
retention bound directly from the range predicate plus the watermarks
(a start row can stop waiting for probes ``window`` after its event
time, a probe can never match a start older than ``window``), so state
is bounded by arrival skew — not by stream length — on both sides.

Scale shape: the join keys shard state by (key) exactly like the batch
banded join shards work by (key, bucket); per-key state holds only the
rows inside the watermark-bounded time horizon.  No foreachBatch
re-read, no custom state store — the engine's own symmetric hash join
does the work.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    starts: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    window_seconds: float,
    start_ts: str = "ts",
    probe_ts: str = "ts",
    watermark: str = "0 seconds",
    probe_prefix: str = "p_",
) -> DataFrame:
    """Every (start, probe) pair with equal ``key_cols`` and
    ``start_ts <= probe_ts < start_ts + window`` over two STREAMS.

    Produces the same rows as the batch
    ``interval_join_pairs(starts, probes, ...)`` on the same data
    (proven in tests/test_streaming.py), with probe columns prefixed
    by ``probe_prefix``.  ``watermark`` is the tolerated arrival
    lateness; it bounds join state on both sides.
    """
    keys = list(key_cols)
    w_us = int(round(window_seconds * 1_000_000))
    p = probes.select(
        *[F.col(k).alias(f"{probe_prefix}{k}") for k in keys],
        *[
            F.col(c).alias(f"{probe_prefix}{c}")
            for c in probes.columns
            if c not in keys
        ],
    ).withWatermark(f"{probe_prefix}{probe_ts}", watermark)
    s = starts.withWatermark(start_ts, watermark)
    pts = F.col(f"{probe_prefix}{probe_ts}")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(f"{probe_prefix}{k}") for k in keys],
    )
    cond = (
        cond
        & (pts >= F.col(start_ts))
        & (pts < F.col(start_ts) + F.expr(f"INTERVAL {w_us} MICROSECONDS"))
    )
    return s.join(p, cond, "inner").drop(
        *[f"{probe_prefix}{k}" for k in keys]
    )
