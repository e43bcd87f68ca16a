"""Stratified sampling + embedding quantization operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from gnocchi_spark.operators.sampling import stratified_sample
from gnocchi_spark.operators.similarity import l2_normalize, quantize_int8


def test_stratified_sample_matches_naive_plan(spark):
    # the two-phase pruned plan must equal the single global window
    rows = [Row(id=i, s=f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows).repartition(8)
    got = {
        (r["s"], r["rank"]): r["id"]
        for r in stratified_sample(df, ["s"], 5, "id").collect()
    }
    naive = Window.partitionBy("s").orderBy(F.md5(F.col("id").cast("string")), "id")
    want = {
        (r["s"], r["rank"]): r["id"]
        for r in df.withColumn("rank", F.row_number().over(naive))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want
    assert len(got) == 15  # 3 strata x 5


def test_stratified_sample_deterministic_key(spark):
    # rank-1 doc per stratum is the python-md5 minimum — engine parity
    rows = [Row(id=i, s="all") for i in range(50)]
    df = spark.createDataFrame(rows)
    [top] = stratified_sample(df, ["s"], 1, "id").collect()
    want = min(range(50), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert top["id"] == want


def test_quantize_int8_golden(spark):
    df = spark.createDataFrame([Row(v=[3.0, 4.0])])
    [r] = df.select(quantize_int8(l2_normalize(F.col("v"))).alias("q")).collect()
    # unit vector (0.6, 0.8) -> round(76.2)=76, round(101.6)=102
    assert r["q"] == [76, 102]


def test_quantize_int8_clamps(spark):
    # already-normalized input is assumed; oversized components clamp
    df = spark.createDataFrame([Row(v=[2.0, -2.0, 1.0])])
    [r] = df.select(quantize_int8(F.col("v")).alias("q")).collect()
    assert r["q"] == [127, -127, 127]
