"""Scale + skew stress for the ExactSubstr span family (r09).

Reproduces the SCALE.md figures for repeated_span_report /
repeated_span_apply:

- 30x affine-cipher corpus replication (bench._replicated_docs — the
  cipher preserves within-replica repeat structure, so output mass must
  grow exactly linearly while the wall should grow sub-linearly), and
- a hot-gram A/B (one 8-token phrase planted into 50% of documents vs
  the uniform corpus — the gram-key count and owner min must absorb the
  skew map-side).

All walls are median-of-3 interleaved warm runs (the bench.py
deep-stress protocol).  Writes SPANS_STRESS_r{N}.json at the repo root
(round from $SPARK_GRAFT_ROUND, default 9).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.operators.pipeline import (  # noqa: E402
    repeated_span_apply,
    repeated_span_report,
)
from gnocchi_spark.session import get_spark  # noqa: E402


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _median3(fn):
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return sorted(walls)[1], [round(w, 2) for w in walls]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPANS_STRESS_FACTOR", "30"))
    spark = get_spark("gnocchi-spark-spans-stress")
    spark.sparkContext.setLogLevel("ERROR")
    bench = _bench()

    docs1 = tables.load(spark, sf_dir, "documents").localCheckpoint(eager=True)
    docsD = bench._replicated_docs(spark, sf_dir, factor).localCheckpoint(
        eager=True
    )
    out = {"sf_dir": sf_dir, "factor": factor, "ops": {}}

    for name, op, mass in (
        ("report", repeated_span_report, lambda df: df.count()),
        (
            "apply",
            repeated_span_apply,
            lambda df: df.agg(F.sum("n_removed")).collect()[0][0],
        ),
    ):
        # interleave 1x / Dx so a load transient hits both sides
        w1 = []
        wD = []
        for _ in range(3):
            t0 = time.time()
            m1 = mass(op(docs1, n=8))
            w1.append(time.time() - t0)
            t0 = time.time()
            mD = mass(op(docsD, n=8))
            wD.append(time.time() - t0)
        t1, tD = sorted(w1)[1], sorted(wD)[1]
        out["ops"][name] = {
            "t1": round(t1, 2),
            "t_deep": round(tD, 2),
            "t1_runs": [round(w, 2) for w in w1],
            "t_deep_runs": [round(w, 2) for w in wD],
            "wall_growth": round(tD / t1, 2),
            "vs_linear": round(tD / t1 / factor, 2),
            "mass_1x": m1,
            "mass_deep": mD,
            "mass_growth": round(mD / m1, 2),
        }

    # hot-gram A/B: one 8-token phrase on 50% of the 1x corpus
    phrase = "hot gram skew stress phrase tokens here now"
    hot = docs1.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(phrase + " "), F.col("text")),
        ).otherwise(F.col("text")),
    ).localCheckpoint(eager=True)
    for name, op in (("report", repeated_span_report), ("apply", repeated_span_apply)):
        wu = []
        wh = []
        for _ in range(3):
            t0 = time.time()
            op(docs1, n=8).count()
            wu.append(time.time() - t0)
            t0 = time.time()
            op(hot, n=8).count()
            wh.append(time.time() - t0)
        tu, th = sorted(wu)[1], sorted(wh)[1]
        out["ops"][name]["hot_gram"] = {
            "uniform": round(tu, 2),
            "hot": round(th, 2),
            "hot_over_uniform": round(th / tu, 2),
        }

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SPANS_STRESS_r{os.environ.get('SPARK_GRAFT_ROUND', '9')}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
