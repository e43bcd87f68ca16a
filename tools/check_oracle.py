"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py on Spark at
sf0.01 and its ``oracle_sql()`` counterpart in DuckDB over the same
parquet, then compares row count, sorted column names, and
order-insensitive values.  Usage::

    python tools/check_oracle.py [query-name ...] [--sf DIR]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            if s[c].dtype == "float64":
                eq = (s[c].fillna(-1e308) - o[c].fillna(-1e308)).abs() <= 0
            elif pd.api.types.is_datetime64_any_dtype(s[c]):
                eq = (s[c].isna() & o[c].isna()) | (s[c] == o[c])
            else:
                eq = s[c].fillna("§") == o[c].fillna("§") if s[c].dtype == object else s[c] == o[c]
            bad = int((~eq).sum())
            if bad:
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: {bad} mismatched values, first at row {i}: "
                    f"spark={s[c][i]!r} oracle={o[c][i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args: list[str] = []
    skip = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    mod = load_entry()
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = args or list(qs)

    from gnocchi_spark.session import get_spark

    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
