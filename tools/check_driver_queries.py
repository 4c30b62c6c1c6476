#!/usr/bin/env python3
"""Self-check mirroring the driver's correctness gate: run every
driver_queries entry in Spark AND its DuckDB oracle at sf0.01, compare
row counts, column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return str(v)


def rowset(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(tuple(norm(r[c]) for c in cols) for r in df.to_dict("records"))
    return cols, rows


def main():
    from search_engine_spark.driver_queries import QUERIES
    from search_engine_spark.session import get_spark

    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    failures = 0
    for name, (fn, sql) in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
            ddf = con.sql(sql).df()
            scols, srows = rowset(sdf)
            dcols, drows = rowset(ddf)
            ok = scols == dcols and srows == drows
            status = "OK " if ok else "FAIL"
            print(f"{status} {name}: spark {len(srows)}x{len(scols)} duck {len(drows)}x{len(dcols)}")
            if not ok:
                failures += 1
                if scols != dcols:
                    print("  cols:", scols, "vs", dcols)
                diff1 = [r for r in srows if r not in set(drows)][:3]
                diff2 = [r for r in drows if r not in set(srows)][:3]
                print("  spark-only:", diff1)
                print("  duck-only :", diff2)
        except Exception as e:
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
