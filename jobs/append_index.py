#!/usr/bin/env python
"""Incremental index-append job (crawl refresh, runnable via
``spark-submit --py-files engine.zip jobs/append_index.py``).

Indexes a NEW pages batch into an EXISTING warehouse built by
jobs/build_index.py: only the delta is extracted, id-stamped and packed;
one shuffle-merge pass over all partials (old + new) then rewrites the
packed index — the LSM-compaction shape a 100-TB crawl refresh needs,
converging bit-identically to a from-scratch build of the union corpus
(see operators/pipeline.py run_append).

Example (local):
  spark-submit --master 'local[32]' jobs/append_index.py \
      --pages /tmp/se_pages_delta.parquet \
      --warehouse /tmp/se_wh --label refresh_2026_08
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="delta pages parquet path")
    ap.add_argument("--warehouse", required=True,
                    help="existing warehouse from jobs/build_index.py")
    ap.add_argument("--label", default="delta1",
                    help="append label (checkpoint namespace + idempotence "
                         "guard; a completed label is never re-applied)")
    ap.add_argument("--compaction", choices=["full", "tiered"],
                    default="full",
                    help="full: re-merge every partial (bit-identical to a "
                         "from-scratch union build); tiered: copy untouched "
                         "doc buckets without decoding, re-merge only the "
                         "delta-touched tail (same query results, looser "
                         "stored WAND bounds until the next full merge)")
    ap.add_argument("--max-generations", type=int, default=8,
                    help="tiered compaction-debt cap: auto-promote to a "
                         "full merge once the manifest would exceed this "
                         "many generations")
    ap.add_argument("--bound-inflation-limit", type=float, default=1.25,
                    help="tiered compaction-debt cap on WAND bound "
                         "looseness max(1, avgdl_new/avgdl_gen)")
    args = ap.parse_args()

    from search_engine_spark.operators.pipeline import run_append
    from search_engine_spark.session import get_spark, ship_package

    spark = get_spark("append-index")
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.pages)
    n_pages = pages.count()
    t0 = time.perf_counter()
    cat = run_append(spark, pages, args.warehouse, label=args.label,
                     compaction=args.compaction,
                     max_generations=args.max_generations,
                     bound_inflation_limit=args.bound_inflation_limit)
    elapsed = time.perf_counter() - t0
    stats = cat.read("index_stats").collect()[0].asDict()
    print(json.dumps({
        "job": "append_index",
        "delta_pages": n_pages,
        "seconds": round(elapsed, 3),
        "n_docs_total": int(stats["n_docs"]),
        "avgdl": round(float(stats["avgdl"]), 4),
        "packed_rows": cat.read("postings_packed").count(),
    }))


if __name__ == "__main__":
    main()
