"""Isolate the cosine_topk scoring-stage forms on sf0.1 embeddings.

Forms:
  fold    — broadcast join + zip_with/aggregate cosine (the r12 shape)
  lit1    — ONE selectExpr: explode(array(50 x named_struct(dot64/norm)))
  lit2    — split: 50 score columns in one select, then array/explode
Interleaved 3x each, noop sink, fresh clearCache between runs.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gnocchi_spark import tables
from gnocchi_spark.session import get_spark
from gnocchi_spark.operators.dedup import spread_for_compute
from gnocchi_spark.operators.similarity import cosine
import math

spark = get_spark("cosbench")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
emb = tables.load(spark, sf, "embeddings")
sample = emb.where(F.col("vec_id") % 97 == 1).orderBy("vec_id").limit(50)
q_rows = [(int(r["vec_id"]), list(r["embedding"])) for r in sample.collect()]
dim = len(q_rows[0][1])
print("n_corpus", emb.count(), "n_q", len(q_rows), "dim", dim)

c = spread_for_compute(emb).select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))

def fold():
    q = sample.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    return (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
             .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 5))
             .select("query_id", "neighbor_id", "cosine"))

elem = [f"__vd[{i}]" for i in range(dim)]
vnorm = "sqrt(" + " + ".join(f"{e} * {e}" for e in elem) + ")"

def entries():
    out = []
    for qid, qv in q_rows:
        qn = 0.0
        terms = []
        for e, x in zip(elem, qv):
            xf = float(x); qn += xf * xf
            terms.append(f"{e} * {xf!r}D")
        score = f"round(({' + '.join(terms)}) / ({math.sqrt(qn)!r}D * __vn), 5)"
        out.append((qid, score))
    return out

def lit1():
    ents = [f"named_struct('query_id', {qid}L, 'cosine', CASE WHEN size(__vd) = {dim} THEN {s} END)" for qid, s in entries()]
    return (c.selectExpr("neighbor_id", "transform(cv, x -> CAST(x AS DOUBLE)) AS __vd")
             .selectExpr("neighbor_id", "__vd", f"{vnorm} AS __vn")
             .selectExpr("neighbor_id", f"explode(array({', '.join(ents)})) AS __qs")
             .select(F.col("__qs.query_id").alias("query_id"), "neighbor_id", F.col("__qs.cosine").alias("cosine"))
             .where(F.col("query_id") != F.col("neighbor_id")))

def lit2():
    sc = [f"CASE WHEN size(__vd) = {dim} THEN {s} END AS __s{j}" for j, (qid, s) in enumerate(entries())]
    arr = ", ".join(f"named_struct('query_id', {qid}L, 'cosine', __s{j})" for j, (qid, s) in enumerate(entries()))
    return (c.selectExpr("neighbor_id", "transform(cv, x -> CAST(x AS DOUBLE)) AS __vd")
             .selectExpr("neighbor_id", "__vd", f"{vnorm} AS __vn")
             .selectExpr("neighbor_id", *sc)
             .selectExpr("neighbor_id", f"explode(array({arr})) AS __qs")
             .select(F.col("__qs.query_id").alias("query_id"), "neighbor_id", F.col("__qs.cosine").alias("cosine"))
             .where(F.col("query_id") != F.col("neighbor_id")))

forms = {"fold": fold, "lit1": lit1, "lit2": lit2}
# parity check first
import hashlib
vals = {}
for name, fn in forms.items():
    rows = sorted(map(tuple, fn().collect()))
    vals[name] = hashlib.md5(str(rows).encode()).hexdigest()
    spark.catalog.clearCache()
print("parity", vals, "OK" if len(set(vals.values())) == 1 else "MISMATCH")

for rnd in range(3):
    for name, fn in forms.items():
        t0 = time.time()
        df = fn()
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.catalog.clearCache()
        print(f"round {rnd} {name}: construct {t1-t0:.3f} execute {t2-t1:.3f}", flush=True)
spark.stop()
