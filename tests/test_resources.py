"""Resource-plane tests: dynamic resource types, history union view,
wildcard matching, granularity intersection (SURVEY §1.1, §1.3, §2.5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gnocchi_spark.operators.read import granularity_intersection
from gnocchi_spark.operators.resource_types import (
    ResourceTypeAttribute,
    attributes_schema,
    fill_attribute,
    typed_view,
)
from gnocchi_spark.operators.resources import (
    fnmatch_to_rlike,
    history_union_view,
    lifespan,
    split_creator,
    wildcard_metrics,
)
from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem


def test_attribute_validation_rules():
    with pytest.raises(ValueError):
        ResourceTypeAttribute("revision", "string")  # reserved name
    with pytest.raises(ValueError):
        ResourceTypeAttribute("x", "float")  # unknown type
    with pytest.raises(ValueError):
        ResourceTypeAttribute("x", "number", min=5, max=1)
    schema = attributes_schema(
        [
            ResourceTypeAttribute("display_name", "string", required=True),
            ResourceTypeAttribute("flavor_id", "uuid"),
            ResourceTypeAttribute("launched_at", "datetime"),
            ResourceTypeAttribute("vcpus", "number"),
            ResourceTypeAttribute("active", "bool"),
        ]
    )
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "string", "string", "timestamp", "double", "boolean",
    ]
    assert not schema["display_name"].nullable


def test_typed_view_bounds_and_fill(spark):
    rows = [
        Row(id=1, attributes='{"vcpus": 4, "name": "web"}'),
        Row(id=2, attributes='{"vcpus": 999, "name": "big"}'),   # > max
        Row(id=3, attributes='{"name": "missing-vcpus"}'),        # required
        Row(id=4, attributes='{"vcpus": 2, "name": ""}'),
    ]
    df = spark.createDataFrame(rows)
    attrs = [
        ResourceTypeAttribute("vcpus", "number", required=True, min=1, max=64),
        ResourceTypeAttribute("name", "string", max_length=10),
    ]
    got = {r["id"]: r["vcpus"] for r in typed_view(df, attrs).collect()}
    assert got == {1: 4.0, 4: 2.0}
    # keep_invalid surfaces the validity flag instead of dropping
    flags = {
        r["id"]: r["__valid"]
        for r in typed_view(df, attrs, keep_invalid=True).collect()
    }
    assert flags == {1: True, 2: False, 3: False, 4: True}
    # schema-change backfill
    filled = fill_attribute(
        typed_view(df, attrs), ResourceTypeAttribute("tier", "string"), "std"
    )
    assert {r["tier"] for r in filled.collect()} == {"std"}


def test_history_union_view_semantics(spark):
    t0 = datetime.datetime(2026, 1, 1)
    live = spark.createDataFrame([Row(resource_id=1, tier="hi", revision_start=t0)])
    hist = spark.createDataFrame(
        [
            Row(
                resource_id=1,
                tier="lo",
                revision_start=datetime.datetime(2025, 1, 1),
                revision_end=t0,
                revision=1,
            )
        ]
    )
    got = {r["revision"]: r for r in history_union_view(live, hist).collect()}
    assert got[-1]["revision_end"] is None  # live row: open interval
    assert got[1]["revision_end"] == t0


def test_wildcard_anchoring(spark):
    df = spark.createDataFrame(
        [Row(name="cpu.idle"), Row(name="disk.cpu.idle"), Row(name="cpu")]
    )
    got = {r["name"] for r in wildcard_metrics(df, "cpu*").collect()}
    # \A anchor: must not match the 'cpu' inside 'disk.cpu.idle'
    assert got == {"cpu.idle", "cpu"}
    assert fnmatch_to_rlike("a*").startswith("\\A")


def test_lifespan_and_creator_split(spark):
    df = spark.createDataFrame(
        [
            Row(
                started_at=datetime.datetime(2026, 1, 1),
                ended_at=datetime.datetime(2026, 1, 3),
                creator="alice:proj1",
            ),
            Row(started_at=datetime.datetime(2026, 1, 1), ended_at=None, creator="bob"),
        ]
    )
    user, project = split_creator(F.col("creator"))
    out = df.select(
        lifespan(F.col("started_at"), F.col("ended_at")).alias("ls"),
        user.alias("u"),
        project.alias("p"),
    ).collect()
    assert out[0]["ls"].days == 2 and out[0]["u"] == "alice" and out[0]["p"] == "proj1"
    assert out[1]["ls"] is None and out[1]["u"] == "bob" and out[1]["p"] == ""


def test_granularity_intersection():
    p1 = ArchivePolicy(
        "a", 0, (ArchivePolicyItem(60.0, points=100), ArchivePolicyItem(3600.0, points=100))
    )
    p2 = ArchivePolicy(
        "b", 0, (ArchivePolicyItem(3600.0, points=10), ArchivePolicyItem(86400.0, points=10))
    )
    # intersection, coarse-first evaluation order (processor.py:165)
    assert granularity_intersection({"m1": p1, "m2": p2}) == [3600.0]
    assert granularity_intersection({"m1": p1}, requested=60.0) == [60.0]
    with pytest.raises(ValueError):
        granularity_intersection({"m1": p1, "m2": p2}, requested=60.0)
    p3 = ArchivePolicy("c", 0, (ArchivePolicyItem(1.0, points=10),))
    with pytest.raises(ValueError):
        granularity_intersection({"m1": p1, "m3": p3})


def test_filters_rbac_composition(spark):
    # compose_search_filter (rest/aggregates/api.py:541-556): whatever
    # the caller sends, the composed scope is a subset of what the
    # policy filter alone allows — the caller can narrow, never widen.
    from gnocchi_spark.plans.filters import compile_filter, compose_search_filter

    df = spark.createDataFrame(
        [
            Row(rid=i, creator=f"user{i % 3}:proj{i % 2}", tier=i % 4)
            for i in range(40)
        ]
    )
    policy = {"=": {"created_by_project_id": "proj1"}}
    policy_rows = {r["rid"] for r in df.where(compile_filter(policy)).collect()}
    caller_attempts = [
        None,
        {">=": {"tier": 2}},
        # tries to escape to proj0 via an OR-leg
        {"or": [{">=": {"tier": 2}}, {"=": {"created_by_project_id": "proj0"}}]},
        # tries to negate the policy itself
        {"not": {"=": {"created_by_project_id": "proj1"}}},
    ]
    for caller in caller_attempts:
        composed = compose_search_filter(caller, policy)
        got = {r["rid"] for r in df.where(compile_filter(composed)).collect()}
        assert got <= policy_rows, (caller, got - policy_rows)
    # and without a policy filter the caller's AST passes through intact
    assert compose_search_filter({"=": {"tier": 1}}, None) == {"=": {"tier": 1}}
    assert compose_search_filter(None, None) is None
