"""Persisted IVF index lifecycle on the snapshot store: build once,
serve many, add incrementally — with MANIFEST-level partition pruning.

ivf_cosine_topk (operators/similarity.py) re-assigns the corpus on
every call; a deployment builds the inverted file ONCE and serves from
it.  This module persists the assignment (vec_id, embedding,
centroid_id) in a SnapshotStore keyed by centroid, so:

- SERVE reads only the sacks of the probed centroids — files of
  unprobed clusters are never opened (pruning at the manifest layer,
  before parquet even sees an IO request; with num_sacks sized ≥
  clusters this is per-cluster file pruning).
- ADD assigns a new batch against the FROZEN centroid codebook and
  store.merge()-es it — only the touched sacks rewrite, readers
  pinned to older manifests are unaffected, and the next serve sees
  the new vectors.  (Centroid drift is handled the way real IVF
  deployments do: rebuild the index when add volume warrants it.)
- The centroid codebook itself is tiny and lives next to the data as
  a store table of its own rows.

Scale: serving cost ~ corpus * n_probe / n_clusters as usual for IVF,
but IO drops by the same factor too, because pruning happens at file
granularity — the property a 100 TB vector corpus actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnocchi_spark.operators.store import Manifest, SnapshotStore, _sack_col
from gnocchi_spark.operators.similarity import cosine, ivf_assign


class IvfIndex:
    """An IVF inverted file persisted in two SnapshotStores (members
    keyed by centroid for sack pruning; centroids appended whole)."""

    def __init__(self, root: str, num_sacks: int = 32):
        self.members = SnapshotStore(
            f"{root}/members", num_sacks=num_sacks, metric_col="centroid_id"
        )
        self.codebook = SnapshotStore(
            f"{root}/codebook", num_sacks=1, metric_col="centroid_id"
        )

    # -- build -------------------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        centroids: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> Manifest:
        """Assign every corpus vector to its nearest centroid and
        commit the inverted file.  ``centroids`` carries
        (centroid_id, centroid) — from ivf_train_kmeans or the
        deterministic first-k convention."""
        self.codebook.append(
            centroids.withColumn(
                "centroid_id", F.col("centroid_id").cast("string")
            )
        )
        assigned = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1)
        return self.members.append(
            assigned.withColumn(
                "centroid_id", F.col("centroid_id").cast("string")
            )
        )

    def add(
        self,
        batch: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> Manifest:
        """Incrementally index a batch against the frozen codebook;
        only the sacks of the clusters the batch lands in rewrite."""
        spark = batch.sparkSession
        centroids = self.codebook.read(spark).select(
            F.col("centroid_id").cast("long").alias("centroid_id"), "centroid"
        )
        assigned = ivf_assign(batch, centroids, id_col, vec_col, n_probe=1)
        return self.members.merge(
            assigned.withColumn(
                "centroid_id", F.col("centroid_id").cast("string")
            ),
            key_cols=(id_col,),
        )

    # -- serve -------------------------------------------------------------

    def _files_for_centroids(
        self, spark: SparkSession, centroid_ids: list[str]
    ) -> list[str]:
        """Manifest-level pruning: map probed centroids to their sacks
        (same hash the writer used) and keep only those sacks' files."""
        ids_df = spark.createDataFrame(
            [(c,) for c in centroid_ids], "centroid_id string"
        )
        sacks = {
            r[0]
            for r in ids_df.select(
                _sack_col("centroid_id", self.members.num_sacks).alias("s")
            ).collect()
        }
        m = self.members.current()
        return [
            p
            for p in m.files
            if SnapshotStore._file_sack(p) in sacks
        ]

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k cosine neighbors from the persisted inverted file.
        Probes pick n_probe clusters per query; only those clusters'
        data files are read."""
        from pyspark.sql import Window

        spark = queries.sparkSession
        centroids = self.codebook.read(spark).select(
            F.col("centroid_id").cast("long").alias("centroid_id"), "centroid"
        )
        probes = ivf_assign(
            queries, centroids, id_col, vec_col, n_probe=n_probe
        ).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("centroid_id").cast("string").alias("centroid_id"),
        )
        probe_ids = [
            r[0] for r in probes.select("centroid_id").distinct().collect()
        ]
        files = self._files_for_centroids(spark, probe_ids)
        if not files:
            # probe miss / empty index (r12, degenerate-input sweep): an
            # ANN search that finds no indexed candidates returns zero
            # neighbors — same shape, no rows — not an error; raising
            # here turned a legitimate tiny-corpus probe miss into a 500
            id_type = queries.schema[id_col].dataType.simpleString()
            return probes.select(
                "query_id",
                F.lit(None).cast("int").alias("rank"),
                F.lit(None).cast(id_type).alias("neighbor_id"),
                F.lit(None).cast("double").alias("cosine"),
            ).where(F.lit(False))
        members = spark.read.parquet(*self.members._abs(files)).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            "centroid_id",
        )
        scored = (
            members.join(F.broadcast(probes), "centroid_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 5))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine")
        )
