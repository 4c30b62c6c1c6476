#!/usr/bin/env python
"""Query benchmark job: top-10 BM25 latency over the frozen reference
query set against a built warehouse.

  spark-submit --master 'local[32]' jobs/query_bench.py \
      --warehouse /tmp/se_wh --engine packed
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--engine", choices=["packed", "logical"], default="packed")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--synonyms", action="store_true")
    ap.add_argument("--queries", help="file with one query per line "
                    "(default: the frozen reference set)")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark, ship_package
    from search_engine_spark.sources.catalog import IndexCatalog

    spark = get_spark("query-bench")
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")
    cat = IndexCatalog(spark, args.warehouse)

    if args.engine == "packed":
        from search_engine_spark.plans.wand import PackedQueryEngine

        eng = PackedQueryEngine.from_catalog(cat)
        eng.packed = eng.packed.cache()
        eng.packed.count()
    else:
        from search_engine_spark.plans.executor import QueryEngine

        eng = QueryEngine.from_catalog(cat)
    # hot-path tables cached: the serving analogue of the reference's
    # mmap+mlock index residency (csolver/main.cpp:63-97)
    eng.docmeta = eng.docmeta.cache()
    eng.docmeta.count()

    if args.queries:
        queries = [q.strip() for q in Path(args.queries).read_text().splitlines()
                   if q.strip()]
    else:
        from search_engine_spark.sources.queryset import QUERY_STRINGS

        queries = QUERY_STRINGS

    lat = {}
    for q in queries:
        t0 = time.perf_counter()
        eng.search(q, k=args.k, synonyms=args.synonyms).collect()
        lat[q] = round(time.perf_counter() - t0, 4)
    vals = list(lat.values())
    print(json.dumps({
        "job": "query_bench",
        "engine": args.engine,
        "n_queries": len(vals),
        "p50_sec": round(statistics.median(vals), 4),
        "p90_sec": round(sorted(vals)[int(0.9 * (len(vals) - 1))], 4),
        "total_sec": round(sum(vals), 4),
        "per_query": lat,
    }))


if __name__ == "__main__":
    main()
