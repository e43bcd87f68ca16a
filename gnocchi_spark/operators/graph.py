"""Co-occurrence graph construction and iterative graph algorithms
(PageRank, synchronous label propagation).

The reference has no graph operators (its joins are resource<->metric
equi-joins, gnocchi/rest/api.py); these serve the engine's analytics
charter over event streams: "who acts together" graphs and the
iterative-join workload class.

Scale design — the edge generator is the part that decides 100 TB
viability.  A co-occurrence graph pairs every two users sharing a
time bucket, so the raw pair space is sum-over-buckets of n_b² where
n_b is PER-BUCKET CONCURRENCY — a number that grows with fleet size
at fixed bucket width.  Measured (BENCH scale_stress r05): 10x users
at constant per-user rate made uncapped label propagation 40x slower,
because every bucket densified 10x and the bucket self-join squared
it.  The fix is deterministic degree-capped sparsification: rank each
bucket's members by md5(user) and pair only the first
``max_per_bucket`` — pair space <= cap² per bucket, i.e. LINEAR in
buckets/time regardless of concurrency, while small buckets (below
the cap) keep the exact graph.  The md5 rank makes the sparsified
graph a pure function of the data, so a SQL oracle replays it
bit-for-bit and incremental runs see a stable graph.  (The same
technique every production similarity/graph pipeline applies when a
blocking key gets hot; cf. the df-capped shingle blocking in
operators/dedup.ngram_jaccard_pairs.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_edges(
    events: DataFrame,
    bucket: Column,
    node_col: str = "user_id",
    max_per_bucket: int = 32,
) -> DataFrame:
    """Symmetric (src, dst) edges between distinct nodes sharing a
    bucket, with per-bucket membership capped at ``max_per_bucket``
    by deterministic md5 rank (see module docstring for why the cap
    is the scale-critical piece)."""
    occ = events.select(F.col(node_col).alias("node"), bucket.alias("b")).distinct()
    w = Window.partitionBy("b").orderBy(
        F.md5(F.col("node").cast("string")), F.col("node")
    )
    capped = (
        occ.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_per_bucket)
        .drop("__rk")
    )
    o2 = capped.select(F.col("node").alias("node2"), F.col("b").alias("b2"))
    return (
        capped.join(
            o2, (F.col("b") == F.col("b2")) & (F.col("node") != F.col("node2"))
        )
        .select(F.col("node").alias("src"), F.col("node2").alias("dst"))
        .distinct()
    )


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85) -> DataFrame:
    """Unrolled synchronous PageRank over a (src, dst) edge frame.
    Returns (uid, degree, p).  Every iteration is one key-partitioned
    join + aggregate on the SAME edge partitioning; lineage is
    checkpoint-truncated per iteration so plan cost stays O(1) per
    round (see queries.user_pagerank history).

    NOTE (r10 checkpoint hygiene, documented r11): the per-round
    checkpoints are EAGER, so this function runs ``iterations`` Spark
    jobs at CALL time — constructing the result executes the
    iteration, unlike ordinary lazy DataFrame builders."""
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    nn = deg.agg(F.count("*").cast("double").alias("n"))
    p = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("uid"), (F.lit(1.0) / F.col("n")).alias("p")
    )
    ed = edges.join(deg, "src")
    # per-round checkpoint hygiene (r10, the CC-loop pattern): round k
    # materializes eagerly, round k-1's dead blocks are freed, and the
    # final round's blocks are memo-registered reclaim-only instead of
    # leaking one persisted RDD per round for the application lifetime
    from gnocchi_spark.operators.dedup import (
        _tracked_local_checkpoint,
        _unpersist_handles,
        register_result_handles,
    )

    prev_handles: list = []
    for _ in range(iterations):
        p, handles = _tracked_local_checkpoint(
            ed.join(p, ed.src == p.uid)
            .groupBy(F.col("dst").alias("nuid"))
            .agg(F.sum(F.col("p") / F.col("d")).alias("contrib"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("nuid").alias("uid"),
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("contrib")
                ).alias("p"),
            )
        )
        _unpersist_handles(prev_handles)
        prev_handles = handles
    if prev_handles:
        p = register_result_handles(p, prev_handles, "pagerank_p")
    return p.join(deg, p.uid == deg.src).select(
        "uid", F.col("d").alias("degree"), "p"
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over a symmetric (src, dst) edge frame.

    Algorithm: degree-ordered orientation (the MapReduce-era standard,
    cf. Suri & Vassilvitskii "Counting Triangles and the Curse of the
    Last Reducer", WWW'11).  Every undirected edge is kept once,
    directed from the (degree, id)-smaller endpoint to the larger; a
    wedge (a->b, a->c) with b before c in that same order closes into
    a triangle iff the oriented edge (b, c) exists.  Orientation bounds
    each node's out-degree by O(sqrt(m)) regardless of raw degree, so
    the wedge self-join never explodes on hubs — THE property that
    makes triangle counting survive a skewed 100 TB graph (and here the
    degree-capped edge generator has already bounded raw degree too).

    All three joins hash-partition on node ids; no floats anywhere
    until the final coefficient, so the count is bit-deterministic.
    Returns (uid, degree, n_triangles, clustering).
    """
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    # oriented edge list carrying both endpoint degrees
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("db"))
    fwd = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(da, "a")
        .join(db, "b")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b", "db")
    )
    # referenced three times below (wedge left, wedge right, closure
    # probe): truncate lineage so the edge pipeline is computed once,
    # not re-derived per reference; memo-registered reclaim-only (r10)
    from gnocchi_spark.operators.dedup import reclaimable_local_checkpoint

    fwd = reclaimable_local_checkpoint(fwd, "triangle_fwd")
    f2 = fwd.select(
        F.col("a").alias("a2"), F.col("b").alias("c"), F.col("db").alias("dc")
    )
    wedges = fwd.join(f2, fwd.a == f2.a2).where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closer = fwd.select(F.col("a").alias("b"), F.col("b").alias("c"))
    # referenced three times by the per-corner union: truncate so the
    # wedge join runs once
    tri = reclaimable_local_checkpoint(
        wedges.join(closer, ["b", "c"]).select("a", "b", "c"),
        "triangle_tri",
    )
    per_node = (
        tri.select(F.col("a").alias("uid"))
        .union(tri.select(F.col("b").alias("uid")))
        .union(tri.select(F.col("c").alias("uid")))
        .groupBy("uid")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_node, deg.src == per_node.uid, "left")
        .select(
            F.col("src").alias("uid"),
            F.col("d").alias("degree"),
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
            F.round(
                F.when(
                    F.col("d") >= 2,
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / (F.col("d") * (F.col("d") - F.lit(1))).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling over a symmetric (src, dst) edge
    frame: each round removes every node whose CURRENT degree is < k,
    along with its edges; survivors of ``rounds`` peels approximate the
    k-core from above (they equal it once a round removes nothing).

    Fixed unrolling instead of a convergence loop keeps the plan a
    static chain — every round is one degree aggregate + two
    semi-joins, all hash-partitioned on the node id, with lineage
    truncated per round like the other iterative operators.  Returns
    (uid, degree) for surviving nodes with their within-subgraph
    degree.

    NOTE: the per-round checkpoints are EAGER — calling this runs
    ``rounds`` Spark jobs immediately, not at first action (r11).
    """
    from gnocchi_spark.operators.dedup import (
        _tracked_local_checkpoint,
        _unpersist_handles,
        register_result_handles,
    )

    e = edges
    prev_handles: list = []
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count("*").cast("long").alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        # CC-loop checkpoint hygiene (r10): eager round, free previous
        e, handles = _tracked_local_checkpoint(
            e.join(keep, "src", "left_semi").join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
        )
        _unpersist_handles(prev_handles)
        prev_handles = handles
    if prev_handles:
        e = register_result_handles(e, prev_handles, "kcore_e")
    return e.groupBy(F.col("src").alias("uid")).agg(
        F.count("*").cast("long").alias("degree")
    )


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Unrolled synchronous label propagation over a (src, dst) edge
    frame: each round every node adopts its neighbors' most frequent
    label, ties to the SMALLEST label — an exact-integer
    min(struct(-count, label)) argmin, so the result is
    bit-deterministic on any engine.  Returns (uid, lbl).

    NOTE: the per-round checkpoints are EAGER — calling this runs
    ``iterations`` Spark jobs immediately, not at first action (r11)."""
    from gnocchi_spark.operators.dedup import (
        _tracked_local_checkpoint,
        _unpersist_handles,
        register_result_handles,
    )

    lbl = edges.select(
        F.col("src").alias("uid"), F.col("src").alias("lbl")
    ).distinct()
    prev_handles: list = []
    for _ in range(iterations):
        cnt = (
            edges.join(lbl, edges.src == lbl.uid)
            .groupBy("dst", "lbl")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        # CC-loop checkpoint hygiene (r10): eager round, free previous
        lbl, handles = _tracked_local_checkpoint(
            cnt.groupBy(F.col("dst").alias("uid"))
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("negc"), F.col("lbl"))
                ).alias("best")
            )
            .select("uid", F.col("best.lbl").alias("lbl"))
        )
        _unpersist_handles(prev_handles)
        prev_handles = handles
    if prev_handles:
        lbl = register_result_handles(lbl, prev_handles, "labelprop_lbl")
    return lbl
