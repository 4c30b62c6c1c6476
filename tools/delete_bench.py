#!/usr/bin/env python
"""Logical-delete vs survivor-rebuild benchmark (the takedown shape).

Builds the full synthetic corpus, DELETES a deterministic 1% of urls
(jobs/delete_docs.py → pipeline.run_delete: delta-proportional tombstones
+ df patches + survivor stats, no packed rewrite), and separately builds
the surviving 99% from scratch — then verifies the tombstone-masked index
answers the frozen reference query set identically to the from-scratch
survivor index (exact score vectors; urls within tie groups — doc ids
legitimately differ, the scratch build re-stamps densely).  Also times
compact_deletes, the O(corpus) debt-retirement pass.

Usage: python tools/delete_bench.py [--docs 500000] [--cpus 8]
Prints one JSON line; the driver-facing copy lives in BENCH/.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BUILD_ARGS = ["--salt-buckets", "128", "--merge-factor", "4"]


def _run(cmd: list[str], cpus: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       cwd=REPO, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _canon(rows):
    """Rank-identity up to score ties (same contract as append_bench)."""
    groups = [
        (s, sorted(u for u, _ in g))
        for s, g in itertools.groupby(rows, key=lambda r: r[1])
    ]
    if groups:
        s, urls = groups[-1]
        groups[-1] = (s, len(urls))
    return groups


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--delete-pct", type=int, default=1)
    args = ap.parse_args()

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import cached_pages

    pages = str(cached_pages(args.docs))
    victims_p = f"/tmp/se_delete_victims_{args.docs}.parquet"
    survivors_p = f"/tmp/se_delete_survivors_{args.docs}.parquet"

    spark = get_spark("delete-bench-split", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    if not (Path(victims_p).exists() and Path(survivors_p).exists()):
        df = spark.read.parquet(pages).withColumn(
            "_b", F.pmod(F.xxhash64("url"), F.lit(100)))
        df.filter(F.col("_b") < args.delete_pct).select("url") \
            .write.mode("overwrite").parquet(victims_p)
        df.filter(F.col("_b") >= args.delete_pct).drop("_b") \
            .write.mode("overwrite").parquet(survivors_p)

    with tempfile.TemporaryDirectory(prefix="se_delete_bench_") as root:
        wh_del = f"{root}/wh_deleted"
        wh_scr = f"{root}/wh_scratch"

        base = _run([sys.executable, str(REPO / "jobs/build_index.py"),
                     "--pages", pages, "--warehouse", wh_del, "--force",
                     *BUILD_ARGS], args.cpus)
        deleted = _run([sys.executable, str(REPO / "jobs/delete_docs.py"),
                        "--urls", victims_p, "--warehouse", wh_del,
                        "--label", "bench_takedown"], args.cpus)
        scratch = _run([sys.executable, str(REPO / "jobs/build_index.py"),
                        "--pages", survivors_p, "--warehouse", wh_scr,
                        "--force", *BUILD_ARGS], args.cpus)

        from search_engine_spark.plans.wand import PackedQueryEngine
        from search_engine_spark.sources.catalog import IndexCatalog
        from search_engine_spark.sources.queryset import QUERY_STRINGS

        t0 = time.perf_counter()
        mismatches = []
        eng_d = PackedQueryEngine.from_catalog(IndexCatalog(spark, wh_del))
        eng_s = PackedQueryEngine.from_catalog(IndexCatalog(spark, wh_scr))
        for q in QUERY_STRINGS:
            rd = [(r["url"], round(r["score"], 4))
                  for r in eng_d.search(q, k=10).collect()]
            rs = [(r["url"], round(r["score"], 4))
                  for r in eng_s.search(q, k=10).collect()]
            if _canon(rd) != _canon(rs):
                mismatches.append(q)
        verify_sec = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        from search_engine_spark.operators.pipeline import compact_deletes

        compact_deletes(spark, wh_del)
        compact_sec = round(time.perf_counter() - t0, 2)

    out = {
        "metric": "logical delete vs survivor rebuild",
        "docs_total": args.docs,
        "delete_pct": args.delete_pct,
        "cpus": args.cpus,
        "base_build_sec": base.get("seconds"),
        "delete_sec": deleted.get("seconds"),
        "survivor_rebuild_sec": scratch.get("seconds"),
        "delete_vs_rebuild_speedup": round(
            scratch.get("seconds") / deleted.get("seconds"), 2),
        "compact_sec": compact_sec,
        "n_docs_surviving": deleted.get("n_docs_surviving"),
        "queries_checked": len(QUERY_STRINGS),
        "result_mismatches": mismatches,
        "results_identical": not mismatches,
        "verify_sec": verify_sec,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
