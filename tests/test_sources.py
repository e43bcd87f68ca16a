"""Protocol normalizer tests, golden values modeled on the reference's
test_influxdb.py / test_statsd.py / test_amqp1d.py scenarios."""

from __future__ import annotations

import datetime
import json
import uuid

from pyspark.sql import functions as F

from gnocchi_spark.functions.ids import RESOURCE_ID_NAMESPACE_HEX, resource_uuid, uuid5
from gnocchi_spark.sources import collectd, influxdb, injector, prometheus, statsd

UTC = datetime.timezone.utc
NOW = datetime.datetime(2026, 1, 2, 3, 4, 5, tzinfo=UTC)


# ---------------------------------------------------------------------------
# uuid5 shim
# ---------------------------------------------------------------------------

def test_uuid5_matches_python(spark):
    ns = uuid.UUID(RESOURCE_ID_NAMESPACE_HEX)
    names = ["foobar", "host-42", "a@b", "", "unicode-éü"]
    df = spark.createDataFrame([(n,) for n in names], ["name"]).select(
        "name", uuid5(RESOURCE_ID_NAMESPACE_HEX, F.col("name")).alias("u")
    )
    got = {r["name"]: r["u"] for r in df.collect()}
    for n in names:
        assert got[n] == str(uuid.uuid5(ns, n)), n


def test_resource_uuid_semantics(spark):
    ns = uuid.UUID(RESOURCE_ID_NAMESPACE_HEX)
    df = spark.createDataFrame(
        [("myhost",), ("5A3C9A1A-F59E-4E24-8A74-29CBF6B37C1F",)], ["rid"]
    ).select(resource_uuid(F.col("rid"), "admin").alias("u"))
    got = [r["u"] for r in df.collect()]
    # non-uuid: hashed with creator; uuid: passed through lowercased
    assert got[0] == str(uuid.uuid5(ns, "myhost\x00admin"))
    assert got[1] == "5a3c9a1a-f59e-4e24-8a74-29cbf6b37c1f"


# ---------------------------------------------------------------------------
# InfluxDB line protocol
# ---------------------------------------------------------------------------

def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
    rows = influxdb.parse_lines(df, now=NOW, **kw).collect()
    return sorted(
        (r["resource_id"], r["metric_name"], r["ts"], r["value"]) for r in rows
    )


def test_influxdb_basic_line(spark):
    got = _parse(spark, ["cpu,host=h1 value=1.5 1000000000"])
    assert got == [
        ("h1", "cpu.value", datetime.datetime(1970, 1, 1, 0, 0, 1), 1.5)
    ]


def test_influxdb_tags_sorted_and_metric_name(spark):
    # remaining tags sorted by key; '/' replaced by '_'
    got = _parse(spark, ["disk/io,zone=z2,host=h1,dev=sda read=2i 2000000000"])
    assert got == [
        ("h1", "disk_io.read@dev=sda,zone=z2", datetime.datetime(1970, 1, 1, 0, 0, 2), 2.0)
    ]


def test_influxdb_multi_field_and_types(spark):
    got = _parse(spark, ['m,host=h f1=1,f2=2.5,f3=3i,f4="str",f5=true 3000000000'])
    names = [g[1] for g in got]
    # string field skipped; bool -> 1.0
    assert names == ["m.f1", "m.f2", "m.f3", "m.f5"]
    assert [g[3] for g in got] == [1.0, 2.5, 3.0, 1.0]


def test_influxdb_default_timestamp_and_missing_rid(spark):
    got = _parse(spark, ["m,host=h v=1", "m,other=t v=2", "garbage"])
    # missing-ts line gets `now`; missing host tag and garbage dropped
    assert got == [("h", "m.v", NOW.replace(tzinfo=None), 1.0)]


def test_influxdb_custom_rid_tag(spark):
    got = _parse(spark, ["m,host=h,srv=s1 v=7 1000000000"], tag_to_rid="srv")
    assert got == [
        ("s1", "m.v@host=h", datetime.datetime(1970, 1, 1, 0, 0, 1), 7.0)
    ]


def test_influxdb_quoted_string_field_with_delimiters(spark):
    # reference test_influxdb.py:144-148: a quoted string field whose
    # value contains a space AND a comma must not derail the numeric
    # field on the same line (string fields are skipped as measures)
    got = _parse(
        spark,
        [
            "system,host=abydos uptime=337369i,"
            'uptime_format="3 days, 21:42" 1510150170000000000'
        ],
    )
    assert got == [
        (
            "abydos",
            "system.uptime",
            datetime.datetime(2017, 11, 8, 14, 9, 30),
            337369.0,
        )
    ]


def test_influxdb_escaped_delimiters(spark):
    # grammar influxdb.py:45-54: '\ ' '\,' '\=' unescape inside
    # measurements, tag keys/values and field keys
    got = _parse(
        spark,
        [r"disk\ usage,host=h1,path=C:\ drive,label=a\,b used\=pct=42 1000000000"],
    )
    assert got == [
        (
            "h1",
            "disk usage.used=pct@label=a,b,path=C: drive",
            datetime.datetime(1970, 1, 1, 0, 0, 1),
            42.0,
        )
    ]


def test_influxdb_escaped_backslash_stays_literal(spark):
    # '\\' is NOT an escape pair: the reference's unquoted_string keeps
    # a lone backslash literal, so '\\ ' = literal backslash + escaped
    # space (both inside the token)
    got = _parse(spark, ["m\\\\ x,host=h v=1 1000000000"])
    assert got == [
        ("h", "m\\ x.v", datetime.datetime(1970, 1, 1, 0, 0, 1), 1.0)
    ]


def test_influxdb_quoted_measurement_unsupported_dropped(spark):
    # quoted measurements/tags need the full pyparsing grammar; the
    # engine drops them instead of mis-parsing
    got = _parse(
        spark,
        ['"my measurement",host=h v=1 1000000000', "m,host=h v=2 1000000000"],
    )
    assert got == [("h", "m.v", datetime.datetime(1970, 1, 1, 0, 0, 1), 2.0)]


# ---------------------------------------------------------------------------
# statsd
# ---------------------------------------------------------------------------

def _flush(spark, packets):
    df = spark.createDataFrame([(p,) for p in packets], ["packet"])
    rows = statsd.flush_aggregate(statsd.parse_packets(df), flush_ts=NOW).collect()
    return {r["metric_name"]: r["value"] for r in rows}


def test_statsd_gauge_last_write_wins(spark):
    assert _flush(spark, ["g1:10|g\ng1:13|g"]) == {"g1|g": 13.0}


def test_statsd_counter_accumulates_with_sampling(spark):
    # 16 + 8/0.5 = 32 (value * 1/sample_rate, statsd.py:77-85)
    assert _flush(spark, ["c1:16|c", "c1:8|c|@0.5"]) == {"c1|c": 32.0}


def test_statsd_timer_last_and_invalid_sampling(spark):
    # sampling on a gauge/timer is a ValueError in the reference -> drop
    got = _flush(spark, ["t1:3|ms\nt1:9|ms", "g1:5|g|@0.5"])
    assert got == {"t1|ms": 9.0}


def test_statsd_mixed_types_distinct_metrics(spark):
    got = _flush(spark, ["x:1|c\nx:2|g\nx:3|ms"])
    assert got == {"x|c": 1.0, "x|g": 2.0, "x|ms": 3.0}


# ---------------------------------------------------------------------------
# collectd
# ---------------------------------------------------------------------------

def test_collectd_identifier_and_explode(spark):
    msgs = [
        {
            "host": "web-1",
            "plugin": "cpu",
            "plugin_instance": "0",
            "type": "cpu",
            "type_instance": "idle",
            "dsnames": ["value"],
            "dstypes": ["derive"],
            "values": [92.5],
            "time": 1000.0,
            "interval": 10.0,
        },
        {
            "host": "web-1",
            "plugin": "interface",
            "plugin_instance": "",
            "type": "if_octets",
            "type_instance": "",
            "dsnames": ["rx", "tx"],
            "dstypes": ["derive", "derive"],
            "values": [1.0, 2.0],
            "time": 1000.0,
            "interval": 10.0,
        },
    ]
    df = spark.createDataFrame([(json.dumps(msgs),)], ["body"])
    rows = collectd.normalize(collectd.parse_json(df)).collect()
    got = sorted((r["resource_id"], r["metric_name"], r["value"]) for r in rows)
    # single-ds: no suffix; multi-ds: -dsname suffix (amqp1d.py:165-180)
    assert got == [
        ("web-1", "cpu-0@cpu-idle", 92.5),
        ("web-1", "interface@if_octets-rx", 1.0),
        ("web-1", "interface@if_octets-tx", 2.0),
    ]
    ts = {r["ts"] for r in rows}
    assert ts == {datetime.datetime(1970, 1, 1, 0, 16, 40)}


# ---------------------------------------------------------------------------
# prometheus
# ---------------------------------------------------------------------------

def test_prometheus_normalize(spark):
    ns = uuid.UUID(RESOURCE_ID_NAMESPACE_HEX)
    data = [
        (
            {"__name__": "up", "job": "api", "instance": "i1"},
            [(1000, 1.0), (2000, 0.0)],
        ),
        ({"__name__": "cpu"}, [(3000, 5.0)]),
        ({"job": "noname"}, [(4000, 9.9)]),  # no __name__: dropped
    ]
    df = spark.createDataFrame(
        [
            (labels, [{"timestamp_ms": t, "value": v} for t, v in samples])
            for labels, samples in data
        ],
        "labels map<string,string>, samples array<struct<timestamp_ms: long, value: double>>",
    )
    rows = prometheus.normalize(df, creator="cr").collect()
    got = sorted(
        (r["original_resource_id"], r["metric_name"], r["ts"], r["value"])
        for r in rows
    )
    assert got == [
        ("api@i1", "up", datetime.datetime(1970, 1, 1, 0, 0, 1), 1.0),
        ("api@i1", "up", datetime.datetime(1970, 1, 1, 0, 0, 2), 0.0),
        ("none@none", "cpu", datetime.datetime(1970, 1, 1, 0, 0, 3), 5.0),
    ]
    rid = {r["original_resource_id"]: r["resource_id"] for r in rows}
    assert rid["api@i1"] == str(uuid.uuid5(ns, "api@i1\x00cr"))


def test_prometheus_decode_real():
    # The wire decode is implemented in pure Python (see
    # tests/test_prometheus_wire.py for full coverage); an empty snappy
    # block decodes to an empty WriteRequest, not a stub error.
    assert prometheus.decode_write_request(b"\x00") == []


# ---------------------------------------------------------------------------
# injector
# ---------------------------------------------------------------------------

def test_injector_shape_and_cadence(spark):
    df = injector.synthetic_measures(spark, n_metrics=3, n_measures=4, interval_s=2.0)
    assert df.count() == 12
    per_metric = df.groupBy("metric_id").count().collect()
    assert {r["count"] for r in per_metric} == {4}
    one = df.where(F.col("metric_id") == "1").orderBy("seq").collect()
    deltas = {
        (b["ts"] - a["ts"]).total_seconds() for a, b in zip(one, one[1:])
    }
    assert deltas == {2.0}


# ---------------------------------------------------------------------------
# batch POST auto-create (rest/api.py:1726-1849)
# ---------------------------------------------------------------------------

def test_batch_post_auto_create(spark):
    from pyspark.sql import types as T

    from gnocchi_spark.policy import ArchivePolicyRule
    from gnocchi_spark.sources import batch_post

    payload = spark.createDataFrame(
        [
            ("server-1", "cpu.util", NOW, 0.5),
            ("server-1", "cpu.util", NOW, 0.7),
            ("server-1", "mem.used", NOW, 100.0),
            ("server-2", "cpu.util", NOW, 0.1),
            ("server-1", "unmatched_metric", NOW, 1.0),
        ],
        ["original_resource_id", "metric_name", "ts", "value"],
    )
    rules = [
        ArchivePolicyRule("cpu", "cpu.*", "high"),
        ArchivePolicyRule("mem", "mem.*", "low"),
    ]
    dim_schema = T.StructType(
        [
            T.StructField("metric_id", T.StringType()),
            T.StructField("resource_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("archive_policy_name", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("creator", T.StringType()),
        ]
    )
    empty_dim = spark.createDataFrame([], dim_schema)

    norm = batch_post.normalize_payload(payload, creator="cr")
    dim1 = batch_post.upsert_metrics(norm, empty_dim, rules, creator="cr")
    rows = {(r["resource_id"], r["name"]): r for r in dim1.collect()}
    # 3 distinct (resource, metric) with matching rules; unmatched dropped
    assert len(rows) == 3
    s1_cpu = next(r for (rid, n), r in rows.items() if n == "cpu.util")
    assert s1_cpu["archive_policy_name"] == "high"
    # ids are deterministic: same payload -> same ids
    norm2 = batch_post.normalize_payload(payload, creator="cr")
    assert (
        norm.select("metric_id").distinct().orderBy("metric_id").collect()
        == norm2.select("metric_id").distinct().orderBy("metric_id").collect()
    )
    # idempotent upsert: re-running adds nothing
    dim2 = batch_post.upsert_metrics(norm, dim1, rules, creator="cr")
    assert dim2.count() == 3
    # facts keyed by metric_id
    facts = batch_post.measures_from_payload(norm)
    assert facts.count() == 5
    per_metric = facts.groupBy("metric_id").count().collect()
    assert sorted(r["count"] for r in per_metric) == [1, 1, 1, 2]


def test_capabilities_contract():
    from gnocchi_spark.policy import capabilities

    caps = capabilities()
    methods = caps["aggregation_methods"]
    # the reference's fixed whitelist: plain methods plus rate: composites
    for m in ("mean", "sum", "min", "max", "count", "std", "median",
              "first", "last", "rate:mean", "rate:last"):
        assert m in methods
    assert methods == sorted(methods)
