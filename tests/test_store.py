"""SnapshotStore: snapshot-isolated reads, optimistic commits,
sack-granular merge rewrites, vacuum safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gnocchi_spark.operators.store import SnapshotStore, StoreConflict, store_merge_sink


def _rollups(spark, rows):
    return spark.createDataFrame(
        rows, "metric_id string, granularity double, bucket_ts long, value double"
    )


def test_append_read_roundtrip_and_versioning(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=4)
    assert store.read(spark) is None
    m1 = store.append(_rollups(spark, [("m1", 60.0, 0, 1.0), ("m2", 60.0, 0, 2.0)]))
    assert m1.version == 1
    m2 = store.append(_rollups(spark, [("m1", 60.0, 60, 3.0)]))
    assert m2.version == 2
    got = store.read(spark)
    assert got.count() == 3
    # pinned read of v1 still sees only the first two rows
    assert store.read(spark, m1).count() == 2


def test_merge_upserts_and_only_rewrites_touched_sacks(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=8)
    base = store.append(
        _rollups(
            spark,
            [("m%d" % i, 60.0, 0, float(i)) for i in range(16)],
        )
    )
    batch = _rollups(spark, [("m3", 60.0, 0, 99.0), ("m3", 60.0, 60, 100.0)])
    m2 = store.merge(batch)
    got = {
        (r["metric_id"], r["bucket_ts"]): r["value"]
        for r in store.read(spark).collect()
    }
    assert got[("m3", 0)] == 99.0  # upserted
    assert got[("m3", 60)] == 100.0  # inserted
    assert got[("m5", 0)] == 5.0  # untouched
    assert len(got) == 17
    # untouched sack files are carried over BY REFERENCE
    batch_sacks = {
        r[0]
        for r in batch.withColumn(
            "sack", F.pmod(F.xxhash64("metric_id"), F.lit(8)).cast("int")
        )
        .select("sack")
        .distinct()
        .collect()
    }
    carried = set(base.files) & set(m2.files)
    assert carried, "untouched files must be reused, not rewritten"
    for p in carried:
        assert SnapshotStore._file_sack(p) not in batch_sacks


def test_pinned_reader_survives_merge_and_vacuum_respects_refs(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=4)
    m1 = store.append(_rollups(spark, [("a", 60.0, 0, 1.0), ("b", 60.0, 0, 2.0)]))
    pinned = store.read(spark, m1)
    store.merge(_rollups(spark, [("a", 60.0, 0, -1.0)]))
    # the pinned plan still computes the OLD values (old files intact)
    vals = {r["metric_id"]: r["value"] for r in pinned.collect()}
    assert vals == {"a": 1.0, "b": 2.0}
    # vacuum keeping both versions removes nothing referenced
    removed = store.vacuum(keep_versions=2)
    assert store.read(spark, m1).count() == 2
    # vacuum to only the latest drops v1-only files
    removed = store.vacuum(keep_versions=1)
    assert removed, "superseded files should be swept"
    latest = {r["metric_id"]: r["value"] for r in store.read(spark).collect()}
    assert latest["a"] == -1.0


def test_version_race_raises_conflict(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=2)
    store.append(_rollups(spark, [("a", 60.0, 0, 1.0)]))
    base = store.current()
    # another writer claims version base+1 first
    rival = os.path.join(
        str(tmp_path / "t"), "manifests", f"manifest-{base.version + 1:08d}.json"
    )
    with open(rival, "w") as f:
        f.write('{"version": %d, "files": []}' % (base.version + 1))
    with pytest.raises(StoreConflict):
        store._commit(base, add=["data/x/part-0.parquet"])
    # but the high-level append retries past it onto the next version
    m = store.append(_rollups(spark, [("b", 60.0, 0, 2.0)]))
    assert m.version == base.version + 2


def test_compact_to_one_file_per_sack(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=2)
    for i in range(3):
        store.append(_rollups(spark, [("m%d" % i, 60.0, 0, float(i))]))
    before = store.read(spark).count()
    m = store.compact()
    assert store.read(spark, m).count() == before
    sacks = {}
    for p in m.files:
        sacks.setdefault(SnapshotStore._file_sack(p), []).append(p)
    for s, files in sacks.items():
        assert len(files) == 1, f"sack {s} not compacted: {files}"


def test_store_merge_sink_adapter(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), num_sacks=2)
    sink = store_merge_sink(store)
    sink(_rollups(spark, [("a", 60.0, 0, 1.0)]), 0)
    sink(_rollups(spark, [("a", 60.0, 0, 2.0), ("b", 60.0, 0, 3.0)]), 1)
    got = {r["metric_id"]: r["value"] for r in store.read(spark).collect()}
    assert got == {"a": 2.0, "b": 3.0}
