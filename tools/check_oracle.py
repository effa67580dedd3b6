"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + order-insensitive values.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import __spark_entry__ as e
    from theoremsearch_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("check_oracle", cores=16)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    # entry names as bare args and/or comma lists; a legacy `--only`
    # flag token is ignored (it used to enter the match set, making
    # `--only a,b` silently select nothing)
    only = {
        name
        for arg in sys.argv[1:]
        if arg != "--only"
        for name in arg.split(",")
        if name
    }
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries() entries: {sorted(unknown)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle) [{wall:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {ex}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(got)} vs {len(want)} [{wall:.1f}s]")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            continue
        g, w = canon(got), canon(want)
        if not g.equals(w):
            failures.append(name)
            diff = (g != w).any(axis=1)
            print(f"FAIL  {name}: value mismatch ({int(diff.sum())} rows) [{wall:.1f}s]")
            bad = diff[diff].index[:3]
            for i in bad:
                print("   spark:", g.loc[i].to_dict())
                print("   duck :", w.loc[i].to_dict())
        else:
            print(f"OK    {name}: {len(got)} rows [{wall:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
