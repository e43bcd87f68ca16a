"""Snapshot-isolated parquet store: manifest-pinned reads, optimistic
atomic commits, sack-granular merge rewrites.

Why this exists: the parquet stand-ins for the reference's mutable
split merge (streaming/ingest.merge_batch_into_rollup, maintenance.
compact_frozen_partitions) are read-modify-OVERWRITE — the merged plan
reads the very files the overwrite deletes, and a concurrent reader
can catch the table half-rewritten.  Staging (writer.
staged_partition_overwrite) fixes the self-read cycle but not reader
isolation or writer-vs-writer races.  This module fixes both the way
modern table formats do (Iceberg/Delta — public designs; implemented
from scratch here):

- Data files are IMMUTABLE.  A commit writes new files and publishes a
  new manifest listing the table's complete file set; nothing a live
  manifest references is ever mutated or deleted.
- Readers pin a manifest version.  A DataFrame built from manifest v
  keeps computing correctly during any number of later commits.
- Writers race on an atomic version claim: manifest-{v+1}.json is
  created with O_EXCL, so exactly one writer wins a version; the loser
  gets StoreConflict and retries against the refreshed state
  (optimistic concurrency, no locks — the same protocol as the
  reference's tooz-based split swap but coordination-free).
- Merge rewrites are SACK-granular: data files are partitioned by
  sack = pmod(xxhash64(metric_id), num_sacks) (the reference's sack
  sharding, incoming/__init__.py:243-247), so upserting a batch only
  rewrites the sacks the batch touches; every other file is carried
  into the new manifest by reference.

On a real deployment root would be an object-store prefix; the local
filesystem here stands in for it (O_EXCL create ≙ conditional PUT).
Scale notes: a manifest lists file paths only — at 128 sacks x a few
generations it is KBs; vacuum() bounds data-file growth; the merge
plan reads only affected-sack files (manifest-level pruning, cheaper
than even parquet row-group pruning since unaffected files are never
opened).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StoreConflict(Exception):
    """Another writer committed this version first; refresh and retry."""


# Test-only fault injection (r12): the restart tests set this to a
# callable that RAISES at a named crash point to prove a death between
# data-file write and manifest commit leaves the table untouched
# (orphan files only, swept by vacuum).  Always None in production.
_crash_hook = None


def _crash_point(name: str) -> None:
    if _crash_hook is not None:
        _crash_hook(name)


@dataclass(frozen=True)
class Manifest:
    version: int
    files: tuple[str, ...]  # paths relative to root

    @property
    def name(self) -> str:
        return f"manifest-{self.version:08d}.json"


def _sack_col(metric_col: str, num_sacks: int):
    return F.pmod(F.xxhash64(F.col(metric_col)), F.lit(num_sacks)).cast("int")


class SnapshotStore:
    def __init__(self, root: str, num_sacks: int = 32, metric_col: str = "metric_id"):
        self.root = root
        self.num_sacks = num_sacks
        self.metric_col = metric_col
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifests")

    def current(self) -> Manifest | None:
        """Latest committed manifest, or None for an empty store."""
        names = [
            n
            for n in os.listdir(self._manifest_dir())
            if n.startswith("manifest-") and n.endswith(".json")
        ]
        if not names:
            return None
        latest = max(names)
        with open(os.path.join(self._manifest_dir(), latest)) as f:
            doc = json.load(f)
        return Manifest(version=doc["version"], files=tuple(doc["files"]))

    def _commit(
        self,
        base: Manifest | None,
        add: Sequence[str],
        remove: Sequence[str] = (),
    ) -> Manifest:
        """Publish base.files - remove + add as version base+1.

        O_EXCL create is the atomic claim: if another writer already
        published this version, raise StoreConflict WITHOUT touching
        any state — the caller's new data files are orphans that
        vacuum() sweeps later (never a torn table).
        """
        version = (base.version if base else 0) + 1
        files = tuple(
            [p for p in (base.files if base else ()) if p not in set(remove)]
            + list(add)
        )
        m = Manifest(version=version, files=files)
        doc = json.dumps(
            {"version": version, "files": list(files), "committed_at": time.time()}
        )
        path = os.path.join(self._manifest_dir(), m.name)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            raise StoreConflict(f"version {version} already committed")
        with os.fdopen(fd, "w") as f:
            f.write(doc)
            f.flush()
            os.fsync(f.fileno())
        return m

    # -- data-file plumbing ------------------------------------------------

    def _write_data(self, df: DataFrame, one_file_per_sack: bool = False) -> list[str]:
        """Write df under a fresh commit token, partitioned by sack
        directories; return the relative paths of the parquet files
        produced (never visible to readers until a manifest references
        them).

        ``sack`` is (re)derived from the metric column here — reading
        manifest leaf files directly does not recover partition-dir
        columns, so sack deliberately lives only in the directory
        layout and is recomputed (deterministic hash) on every write.
        """
        token = uuid.uuid4().hex[:12]
        out = os.path.join(self.root, "data", token)
        if "sack" in df.columns:
            df = df.drop("sack")
        df = df.withColumn("sack", _sack_col(self.metric_col, self.num_sacks))
        if one_file_per_sack:
            df = df.repartition(self.num_sacks, "sack")
        df.write.mode("errorifexists").partitionBy("sack").parquet(out)
        rel = []
        for dirpath, _dirs, names in os.walk(out):
            for n in names:
                if n.endswith(".parquet"):
                    rel.append(
                        os.path.relpath(os.path.join(dirpath, n), self.root)
                    )
        return sorted(rel)

    def _abs(self, rel_files: Sequence[str]) -> list[str]:
        return [os.path.join(self.root, p) for p in rel_files]

    @staticmethod
    def _file_sack(rel_path: str) -> int | None:
        for part in rel_path.split(os.sep):
            if part.startswith("sack="):
                return int(part.split("=", 1)[1])
        return None

    # -- public API --------------------------------------------------------

    def read(
        self, spark: SparkSession, manifest: Manifest | None = None
    ) -> DataFrame | None:
        """DataFrame over a pinned manifest (default: latest); None for
        an empty store.  The returned plan never changes under later
        commits — that IS the snapshot isolation."""
        m = manifest if manifest is not None else self.current()
        if m is None or not m.files:
            return None
        return spark.read.parquet(*self._abs(m.files))

    def append(self, df: DataFrame, max_retries: int = 5) -> Manifest:
        """Append-only commit (frozen splits, immutable aggregates).
        Conflicts only race on the version number, so retry is free —
        the data files are written once and reused."""
        files = self._write_data(df)
        for _ in range(max_retries):
            try:
                return self._commit(self.current(), add=files)
            except StoreConflict:
                continue
        raise StoreConflict("append: version race did not settle")

    def merge(
        self,
        batch: DataFrame,
        key_cols: Sequence[str] = ("metric_id", "granularity", "bucket_ts"),
        max_retries: int = 3,
    ) -> Manifest:
        """Upsert ``batch`` by ``key_cols`` (MERGE semantics: batch row
        wins over stored row with equal keys), rewriting ONLY the data
        files of sacks the batch touches.

        Unlike merge_batch_into_rollup's overwrite, the plan reads old
        files that stay on disk until vacuum — no self-read cycle, no
        reader ever sees a partial table.  On conflict the merge is
        recomputed against the refreshed snapshot (the loser's work is
        discarded — correctness over wasted effort).
        """
        for _ in range(max_retries):
            base = self.current()
            if base is None:
                try:
                    return self._commit(None, add=self._write_data(batch))
                except StoreConflict:
                    continue
            sacks = {
                r[0]
                for r in batch.select(
                    _sack_col(self.metric_col, self.num_sacks).alias("sack")
                )
                .distinct()
                .collect()
            }
            touched = [
                p for p in base.files if self._file_sack(p) in sacks
            ]
            untouched_keep = [p for p in base.files if p not in set(touched)]
            spark = batch.sparkSession
            if touched:
                existing = spark.read.parquet(*self._abs(touched))
                keep = existing.join(
                    batch.select(*key_cols).distinct(),
                    on=list(key_cols),
                    how="left_anti",
                )
                merged = keep.unionByName(batch)
            else:
                merged = batch
            files = self._write_data(merged)
            _crash_point("store:pre-commit")
            try:
                return self._commit(base, add=files, remove=touched)
            except StoreConflict:
                continue
        raise StoreConflict("merge: lost the version race repeatedly")

    def compact(self, max_retries: int = 3) -> Manifest:
        """Rewrite the current file set as one file per sack (frozen-
        split compaction, carbonara-style many-small-splits cure) —
        same optimistic commit; readers of older manifests unaffected."""
        for _ in range(max_retries):
            base = self.current()
            if base is None:
                raise ValueError("compact: empty store")
            spark = SparkSession.getActiveSession()
            df = spark.read.parquet(*self._abs(base.files))
            files = self._write_data(df, one_file_per_sack=True)
            try:
                return self._commit(base, add=files, remove=list(base.files))
            except StoreConflict:
                continue
        raise StoreConflict("compact: lost the version race repeatedly")

    def vacuum(self, keep_versions: int = 2) -> list[str]:
        """Delete manifests older than the newest ``keep_versions`` and
        any data file no kept manifest references (covers commit-loser
        orphans too).  Run only when pinned readers older than the
        horizon are done — the same contract as Iceberg's
        expire_snapshots."""
        names = sorted(
            n
            for n in os.listdir(self._manifest_dir())
            if n.startswith("manifest-") and n.endswith(".json")
        )
        keep, drop = names[-keep_versions:], names[:-keep_versions]
        referenced: set[str] = set()
        for n in keep:
            with open(os.path.join(self._manifest_dir(), n)) as f:
                referenced.update(json.load(f)["files"])
        removed = []
        data_root = os.path.join(self.root, "data")
        for dirpath, _dirs, fnames in os.walk(data_root):
            for fn in fnames:
                rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                if fn.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(self.root, rel))
                    removed.append(rel)
        for n in drop:
            os.remove(os.path.join(self._manifest_dir(), n))
        # sweep now-empty commit-token directories
        for dirpath, dirs, fnames in list(os.walk(data_root, topdown=False)):
            if dirpath != data_root and not dirs and not fnames:
                shutil.rmtree(dirpath, ignore_errors=True)
        return removed


def store_merge_sink(
    store: SnapshotStore,
    key_cols: Sequence[str] = ("metric_id", "granularity", "bucket_ts"),
) -> Callable[[DataFrame, int], None]:
    """foreachBatch adapter: writeStream.foreachBatch(
    store_merge_sink(store)) gives the streaming merge sink snapshot
    isolation instead of the staged-overwrite stand-in."""

    def _sink(batch_df: DataFrame, _epoch_id: int) -> None:
        store.merge(batch_df, key_cols=key_cols)

    return _sink
