"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same configuration scales to a real cluster: AQE handles skew/coalescing at
runtime, and shuffle partition counts are sized by env so a 1000-executor
deployment just raises them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Size the local-mode driver JVM from the machine, not a constant.

    In local mode the driver JVM hosts every executor thread, so its heap
    is the engine's entire memory budget (32 threads at 8g spilled the
    MEMORY_AND_DISK persists in the dedup kernels — measured 10.6s ->
    7.9s on minhash LSH at 32g).  But a fixed 32g default fails outright
    on smaller hosts/cgroup-capped containers, so derive the default:
    ~60% of available memory, clamped to [2g, 32g] — where "available"
    is min(MemTotal, cgroup limit): /proc/meminfo reports the HOST's
    memory inside a memory-capped container (r07 review), so reading
    it alone re-creates the OOM-kill the derivation exists to avoid.
    ``SPARK_GRAFT_DRIVER_MEM`` overrides.  On a real cluster executor
    memory is sized separately per deployment and this default is
    irrelevant.
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    total_gib = None
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    break
    except OSError:
        pass
    if total_gib is None:
        return "8g"
    # cgroup v2 then v1; "max" / absent / unreadable mean uncapped
    for path in (
        "/sys/fs/cgroup/memory.max",
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",
    ):
        try:
            with open(path) as fh:
                raw = fh.read().strip()
            if raw.isdigit():
                total_gib = min(total_gib, int(raw) / (1024**3))
        except OSError:
            continue
    return f"{max(2, min(32, int(total_gib * 0.6)))}g"


ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state(spark: SparkSession, changelog: bool = True) -> bool:
    """Configure RocksDB as the streaming state-store backend — the
    PRODUCTION DEFAULT for the stateful operators (streaming/stateful
    .py, the dedup/session/sketch sinks in streaming/ingest.py).

    Why it matters at scale (the SOAK_r8 arithmetic, see SCALE.md):
    the default HDFSBackedStateStoreProvider keeps every key's state
    ON-HEAP per executor — the soak-measured plateaus (~5.5k rows per
    TTL window for the dedup sink, rows = distinct keys for the
    TTL-off exact mode) multiply by key-shard cardinality and land in
    executor heap, where a 100 TB stream with a churning key
    population turns state into GC pressure and OOM risk.  RocksDB
    keeps state off-heap on local SSD with incremental checkpointing
    to the cluster store: state size is bounded by disk, not heap,
    and snapshot upload cost is incremental in CHANGED keys.

    ``changelog=True`` (the default, r10) additionally enables RocksDB
    CHANGELOG CHECKPOINTING (`...rocksdb.changelogCheckpointing.enabled`):
    each micro-batch uploads only the batch's state CHANGES to the
    checkpoint location instead of a full/incremental SST snapshot on
    the commit path, decoupling commit latency from total state size —
    the difference between O(changed keys) and O(live keys) per batch
    once the dedup/session/sketch sinks carry millions of keys.
    Snapshots still happen, just asynchronously in the background.

    Returns True when the provider class is on the classpath and the
    conf was set (the pyspark binary distribution bundles rocksdbjni;
    a trimmed deployment may not) — False leaves the default provider
    untouched so callers can fall back gracefully.  The conf is read
    at STREAM START: set it before ``writeStream...start()``; running
    queries keep the provider recorded in their checkpoint.
    """
    try:
        spark._jvm.java.lang.Class.forName(ROCKSDB_STATE_PROVIDER)
    except Exception:
        return False
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_PROVIDER
    )
    if changelog:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    return True


def get_spark(app_name: str = "gnocchi-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Deterministic, gnocchi-compatible semantics: UTC everywhere,
        # permissive arithmetic (gnocchi's numpy kernels never raise on
        # div-by-zero; they produce inf/nan — ANSI mode would error out).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # duplicated wire-format map keys (influxdb tags/fields) last-win
        # like the reference's dict(); see sources/influxdb._ensure_last_win
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # The testdata events table stores TIMESTAMP(NANOS) parquet, which
        # Spark 4 rejects outright; read nanos as long and convert at load
        # (see tables.load_events) — a documented ns->us precision policy
        # (SURVEY.md §1.2).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Scale posture: AQE re-plans shuffles at runtime (skew joins,
        # partition coalescing); at 100 TB these are the difference between
        # a working plan and a stuck stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the few mapInPandas paths (multimodal plumbing).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Derived from host memory (see _default_driver_mem) so small
        # containers still start; SPARK_GRAFT_DRIVER_MEM overrides.
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
