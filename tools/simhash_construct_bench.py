"""Attribute dedup_simhash's construct wall: py4j Column building vs
Catalyst analysis vs the persist-materialization job.

Also times an F.expr-string prototype of the same signature projection
(one JVM parse instead of ~1100 py4j Column round-trips) to decide
whether the rewrite is worth it (guide §7.3: avoid generating gigantic
expression trees in loops; precedent: ivf_assign's inlined argmax).

Run on a QUIET machine:  python tools/simhash_construct_bench.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.session import get_spark  # noqa: E402
from gnocchi_spark.queries import ensure_session_conf  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_conf(spark)
    docs = tables.load(spark, SF, "documents")
    docs.agg(F.count("*")).collect()  # warm scan

    from gnocchi_spark.operators.dedup import (
        simhash_signatures,
        spread_for_compute,
    )

    for tag in ("cold", "warm"):
        t0 = time.time()
        sigs = simhash_signatures(spread_for_compute(docs), n_bands=4, band_bits=16)
        t1 = time.time()
        _ = sigs.schema  # forces analysis
        t2 = time.time()
        print(
            f"[column {tag}] build(py4j)={t1-t0:.3f}s analyze={t2-t1:.3f}s",
            flush=True,
        )

    # --- F.expr-string prototype: same math, one JVM parse ---
    from gnocchi_spark.operators.dedup import normalize_text

    def expr_signatures(d, n_bands=4, band_bits=16):
        w = band_bits
        bits = n_bands * w
        tokens = d.select(
            F.col("doc_id"),
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
        )
        # chunk c = conv(substring(md5(tok), 1+8c, 8), 16, 10)
        def chunk(c):
            return f"CAST(conv(substring(md5(tok), {1 + 8 * c}, 8), 16, 10) AS LONG)"

        def bit(k):
            dd = k // 4
            pos = 28 - 4 * (dd % 8) + k % 4
            return f"(shiftright(__ch{dd // 8}, {pos}) & 1)"

        toks2 = tokens.selectExpr(
            "doc_id",
            *[f"{chunk(c)} AS __ch{c}" for c in range(4)],
        )
        agg_exprs = ["count(*) AS n"] + [
            f"sum({bit(k)}) AS c{k}" for k in range(bits)
        ]
        agg = toks2.groupBy("doc_id").agg(
            *[F.expr(e.split(" AS ")[0]).alias(e.split(" AS ")[1]) for e in agg_exprs]
        )
        keys = []
        for i in range(n_bands):
            terms = " + ".join(
                f"(CASE WHEN c{i * w + j} * 2 > n THEN {1 << j}L ELSE 0L END)"
                for j in range(w)
            )
            keys.append(f"CAST({terms} AS LONG)")
        return agg.selectExpr("doc_id", f"array({', '.join(keys)}) AS sig")

    for tag in ("cold", "warm"):
        t0 = time.time()
        sigs2 = expr_signatures(spread_for_compute(docs))
        t1 = time.time()
        _ = sigs2.schema
        t2 = time.time()
        print(
            f"[expr   {tag}] build(py4j)={t1-t0:.3f}s analyze={t2-t1:.3f}s",
            flush=True,
        )

    # execution parity + wall: noop both forms
    for name, frame in (
        ("column", simhash_signatures(spread_for_compute(docs), n_bands=4, band_bits=16)),
        ("expr", expr_signatures(spread_for_compute(docs))),
    ):
        t0 = time.time()
        frame.write.format("noop").mode("overwrite").save()
        print(f"[exec {name}] {time.time()-t0:.3f}s", flush=True)

    # value parity check (cheap, sf0.01-sized corpus would do; here full)
    a = simhash_signatures(
        spread_for_compute(docs), n_bands=4, band_bits=16
    ).withColumnRenamed("sig", "sig_a")
    b = expr_signatures(spread_for_compute(docs)).withColumnRenamed("sig", "sig_b")
    bad = a.join(b, "doc_id").where(~F.expr("sig_a <=> sig_b")).count()
    n = a.count()
    print(f"parity: {bad} mismatched of {n} docs", flush=True)


if __name__ == "__main__":
    main()
