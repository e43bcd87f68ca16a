"""Degenerate-input sweep (r12, VERDICT r11 next #5).

A real user's first broken pipeline is an empty partition — this sweep
runs every registry query against three pathological miniatures of the
testdata star schema and asserts no crash plus oracle agreement where
the oracle is defined:

- ``empty``:   every table with its real schema and ZERO rows;
- ``single``:  exactly one row per table;
- ``allnull``: a handful of rows with every floating-point value column
  (and the embedding vectors) NULL.

Fixtures are carved out of the real sf0.001 parquet with pyarrow, so
column types and the TIMESTAMP(MICROS, isAdjustedToUTC=false) flavor
match the driver's testdata exactly.

Exceptions are only acceptable when the reference raises too — the
allowlist lives in tests/test_degenerate.py with a reference citation
per entry.  Usage::

    python tools/degenerate_sweep.py [--kind empty|single|allnull] [name ...]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
KINDS = ("empty", "single", "allnull")
SRC_SF = "/root/testdata/sf0.001"


def _null_values(table: pa.Table) -> pa.Table:
    """NULL every float/double column and any list-of-float column."""
    arrays = []
    for i, field in enumerate(table.schema):
        t = field.type
        is_float = pa.types.is_floating(t)
        is_vec = pa.types.is_list(t) and pa.types.is_floating(t.value_type)
        if is_float or is_vec:
            arrays.append(pa.nulls(len(table), type=t))
        else:
            arrays.append(table.column(i))
    return pa.Table.from_arrays(arrays, schema=table.schema)


def build_fixtures(root: str, src_sf: str = SRC_SF) -> dict[str, str]:
    """Write the three fixture dirs under ``root``; returns kind->dir."""
    out = {}
    for kind in KINDS:
        d = os.path.join(root, kind)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            full = pq.read_table(os.path.join(src_sf, f"{t}.parquet"))
            if kind == "empty":
                part = full.slice(0, 0)
            elif kind == "single":
                part = full.slice(0, 1)
            else:
                part = _null_values(full.slice(0, 5))
            pq.write_table(part, os.path.join(d, f"{t}.parquet"))
        out[kind] = d
    return out


def run_one(spark, con, queries, oracles, name: str, sf_dir: str) -> dict:
    """Run one query + its oracle over a fixture dir; returns a record
    {status: ok|exc|oracle_exc|mismatch, ...}."""
    from tools.check_oracle import compare

    try:
        sdf = queries[name](spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001 - the sweep records, test judges
        return {"status": "exc", "exc_type": type(e).__name__, "msg": str(e)[:200]}
    if name not in oracles:
        return {"status": "ok", "rows": len(sdf), "oracle": False}
    try:
        odf = con.sql(oracles[name]).df()
    except Exception as e:  # noqa: BLE001
        return {
            "status": "oracle_exc",
            "rows": len(sdf),
            "exc_type": type(e).__name__,
            "msg": str(e)[:200],
        }
    problems = compare(name, sdf, odf)
    if problems:
        return {"status": "mismatch", "rows": len(sdf), "problems": problems}
    return {"status": "ok", "rows": len(sdf), "oracle": True}


def make_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> int:
    import json
    import tempfile
    import time

    from tools.check_oracle import load_entry

    kinds = list(KINDS)
    names_arg = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--kind":
            kinds = [argv[i + 1]]
            i += 2
        else:
            names_arg.append(argv[i])
            i += 1

    mod = load_entry()
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = names_arg or list(qs)

    from gnocchi_spark.session import get_spark

    spark = get_spark("degenerate-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="degen_")
    dirs = build_fixtures(root)
    summary: dict[str, dict] = {}
    for kind in kinds:
        con = make_con(dirs[kind])
        for name in names:
            t0 = time.time()
            rec = run_one(spark, con, qs, oracles, name, dirs[kind])
            rec["secs"] = round(time.time() - t0, 1)
            summary[f"{kind}:{name}"] = rec
            flag = {"ok": "PASS"}.get(rec["status"], rec["status"].upper())
            print(f"{flag} {kind}:{name} {rec}", flush=True)
    bad = {k: v for k, v in summary.items() if v["status"] != "ok"}
    print(json.dumps({"n": len(summary), "bad": bad}, indent=1)[:8000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
