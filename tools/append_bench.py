#!/usr/bin/env python
"""Incremental-append vs full-rebuild benchmark (the crawl-refresh shape).

Splits the cached synthetic corpus 90/10 by url hash, builds the base 90%
from scratch, APPENDS the 10% delta (jobs/append_index.py →
pipeline.run_append: delta-only extract/dedup/pack + one LSM merge pass
over all partials), and separately builds the full 100% from scratch —
then verifies the appended index answers the frozen reference query set
identically to the from-scratch index: exact score vectors and the same
urls within every tie group (rank-identity up to score ties — the
delta's urls interleave with the base's, so doc ids permute and
equal-score neighbors may swap; byte-identity is separately proven by
tests/test_packed_index.py on a sort-ordered fixture).

Usage: python tools/append_bench.py [--docs 2000000] [--cpus 8]
Prints one JSON line; the driver-facing copy lives in BENCH/append_r4.json.
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--delta-pct", type=int, default=10)
    ap.add_argument("--compaction", choices=["full", "tiered"],
                    default="full")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import cached_pages

    pages = str(cached_pages(args.docs))
    base_p = f"/tmp/se_append_base_{args.docs}.parquet"
    delta_p = f"/tmp/se_append_delta_{args.docs}.parquet"

    spark = get_spark("append-bench-split", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    if not (Path(base_p).exists() and Path(delta_p).exists()):
        # deterministic 90/10 split by url hash (pure function, re-runnable)
        df = spark.read.parquet(pages).withColumn(
            "_b", F.pmod(F.xxhash64("url"), F.lit(100)))
        df.filter(F.col("_b") < 100 - args.delta_pct).drop("_b") \
            .write.mode("overwrite").parquet(base_p)
        df.filter(F.col("_b") >= 100 - args.delta_pct).drop("_b") \
            .write.mode("overwrite").parquet(delta_p)

    with tempfile.TemporaryDirectory(prefix="se_append_bench_") as root:
        wh_inc = f"{root}/wh_incremental"
        wh_full = f"{root}/wh_full"

        base = _run([sys.executable, str(REPO / "jobs/build_index.py"),
                     "--pages", base_p, "--warehouse", wh_inc, "--force",
                     *BUILD_ARGS], args.cpus)
        appended = _run([sys.executable, str(REPO / "jobs/append_index.py"),
                         "--pages", delta_p, "--warehouse", wh_inc,
                         "--label", "bench_delta",
                         "--compaction", args.compaction], args.cpus)
        full = _run([sys.executable, str(REPO / "jobs/build_index.py"),
                     "--pages", pages, "--warehouse", wh_full, "--force",
                     *BUILD_ARGS], args.cpus)

        # result identity: the appended index must answer the frozen query
        # set rank-for-rank identically (url, rounded score) to from-scratch
        from search_engine_spark.plans.wand import PackedQueryEngine
        from search_engine_spark.sources.catalog import IndexCatalog
        from search_engine_spark.sources.queryset import QUERY_STRINGS

        def canon(rows):
            """Rank-identity up to score ties: the score vector must match
            exactly and every tie group must contain the same urls; the
            final group may be truncated by k with a doc-id tiebreak, and
            doc ids legitimately permute between the two warehouses (url
            interleave), so it compares as (score, size) only."""
            import itertools

            groups = [
                (s, sorted(u for u, _ in g))
                for s, g in itertools.groupby(rows, key=lambda r: r[1])
            ]
            if groups:
                s, urls = groups[-1]
                groups[-1] = (s, len(urls))
            return groups

        t0 = time.perf_counter()
        mismatches = []
        eng_i = PackedQueryEngine.from_catalog(IndexCatalog(spark, wh_inc))
        eng_f = PackedQueryEngine.from_catalog(IndexCatalog(spark, wh_full))
        for q in QUERY_STRINGS:
            ri = [(r["url"], round(r["score"], 4))
                  for r in eng_i.search(q, k=10).collect()]
            rf = [(r["url"], round(r["score"], 4))
                  for r in eng_f.search(q, k=10).collect()]
            if canon(ri) != canon(rf):
                mismatches.append(q)
        verify_sec = round(time.perf_counter() - t0, 2)

    out = {
        "metric": "incremental append vs full rebuild",
        "compaction": args.compaction,
        "docs_total": args.docs,
        "base_docs": base["index_stats"]["n_docs"],
        "delta_pct": args.delta_pct,
        "cpus": args.cpus,
        "base_build_sec": base.get("seconds"),
        "append_sec": appended.get("seconds"),
        "full_rebuild_sec": full.get("seconds"),
        "append_vs_rebuild_speedup": round(
            full.get("seconds") / appended.get("seconds"), 2),
        "n_docs_after_append": appended.get("n_docs_total"),
        "queries_checked": len(QUERY_STRINGS),
        "result_mismatches": mismatches,
        "results_identical": not mismatches,
        "verify_sec": verify_sec,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
