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
    ap.add_argument("--concurrency", type=int, default=1,
                    help=">1: submit queries from a thread pool and report "
                         "QPS (throughput mode); 1: sequential latencies")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat the query set this many times")
    ap.add_argument("--batch", action="store_true",
                    help="evaluate all (flat) queries in one Spark job via "
                         "search_batch and report QPS")
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

    workload = queries * args.repeat

    if args.batch:
        # one-job batch retrieval (PackedQueryEngine.search_batch): the
        # executor-bound throughput shape — use for scaling measurements
        if args.engine != "packed":
            raise SystemExit("--batch requires --engine packed")
        from search_engine_spark.plans.query_ast import compile_query
        from search_engine_spark.plans.wand import route

        routable = [q for q in queries if route(compile_query(q)) is not None]
        workload = routable * args.repeat
        t0 = time.perf_counter()
        n_rows = eng.search_batch(workload, k=args.k,
                                  synonyms=args.synonyms).count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "job": "query_bench",
            "engine": "packed",
            "mode": "batch",
            "n_queries": len(workload),
            "wall_sec": round(wall, 4),
            "qps": round(len(workload) / wall, 4),
            "result_rows": n_rows,
        }))
        return

    if args.concurrency > 1:
        # throughput mode: Spark's scheduler interleaves the concurrent
        # jobs across all cores — this is what scales with cluster size
        # (single-query latency is scheduling-bound at small corpora)
        from concurrent.futures import ThreadPoolExecutor

        def one(q: str) -> float:
            t0 = time.perf_counter()
            eng.search(q, k=args.k, synonyms=args.synonyms).collect()
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.concurrency) as ex:
            lats = list(ex.map(one, workload))
        wall = time.perf_counter() - t0
        print(json.dumps({
            "job": "query_bench",
            "engine": args.engine,
            "mode": "throughput",
            "concurrency": args.concurrency,
            "n_queries": len(workload),
            "wall_sec": round(wall, 4),
            "qps": round(len(workload) / wall, 4),
            "p50_sec": round(statistics.median(lats), 4),
        }))
        return

    lat = {}
    for q in workload:
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
