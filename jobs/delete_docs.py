#!/usr/bin/env python
"""Document-delete job (de-listings / takedowns / gone-on-recrawl,
runnable via ``spark-submit --py-files engine.zip jobs/delete_docs.py``).

Logically deletes pages BY URL from an existing warehouse: writes
delta-proportional tombstones + per-term df patches and recomputes the
corpus stats over survivors — nothing in the packed index is rewritten,
and every query engine immediately behaves as if the docs were never
indexed (exact BM25 equivalence; see operators/pipeline.py run_delete).
``--compact`` additionally runs the O(corpus) debt-retirement pass that
physically drops the victims' postings, re-stamps survivor ids densely,
and retires the tombstones — bit-identical to a from-scratch build of
the surviving corpus.

Example (local):
  spark-submit --master 'local[32]' jobs/delete_docs.py \
      --urls /tmp/se_takedowns.parquet \
      --warehouse /tmp/se_wh --label takedown_2026_08
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
    ap.add_argument("--urls", required=True,
                    help="parquet path with a 'url' column to delete")
    ap.add_argument("--warehouse", required=True,
                    help="existing warehouse from jobs/build_index.py")
    ap.add_argument("--label", default="del1",
                    help="delete label (idempotence guard; a completed "
                         "label is never re-applied)")
    ap.add_argument("--compact", action="store_true",
                    help="after tombstoning, physically drop the victims' "
                         "postings and retire the tombstones (O(corpus))")
    args = ap.parse_args()

    from search_engine_spark.operators.pipeline import (
        compact_deletes, run_delete,
    )
    from search_engine_spark.session import get_spark, ship_package

    spark = get_spark("delete-docs")
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    urls = spark.read.parquet(args.urls)
    t0 = time.perf_counter()
    cat = run_delete(spark, urls, args.warehouse, label=args.label)
    n_tombs = (cat.read("tombstones").count()
               if cat.exists("tombstones") else 0)
    if args.compact:
        compact_deletes(spark, args.warehouse)
    elapsed = time.perf_counter() - t0
    stats = cat.read("index_stats").collect()[0].asDict()
    print(json.dumps({
        "job": "delete_docs",
        "label": args.label,
        "tombstones_live": (cat.read("tombstones").count()
                            if cat.exists("tombstones") else 0),
        "tombstones_before_compact": n_tombs,
        "compacted": bool(args.compact),
        "seconds": round(elapsed, 3),
        "n_docs_surviving": int(stats["n_docs"]),
        "avgdl": round(float(stats["avgdl"]), 4),
    }))


if __name__ == "__main__":
    main()
