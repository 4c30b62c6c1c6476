#!/usr/bin/env python
"""Index-build job (north rule: runnable via
``spark-submit --py-files engine.zip jobs/build_index.py``).

Reads a Common-Crawl-style pages table (url, warc_ts, html, text, lang),
runs the checkpointed extract → postings → pack → shuffle-merge pipeline
into a warehouse, and prints build metrics.  Resumable: phases whose output
table exists are skipped; pass --force to rebuild from scratch.

Example (local):
  spark-submit --master 'local[32]' jobs/build_index.py \
      --pages /tmp/se_pages/pages_n5000_s42.parquet \
      --warehouse /tmp/se_wh --shards 32 --salt-buckets 16
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
    ap.add_argument("--pages", help="pages parquet path (default: synthesize)")
    ap.add_argument("--synth-docs", type=int, default=5000,
                    help="synthesize this many docs when --pages is omitted")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--merge-factor", type=int, default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from search_engine_spark.operators.pipeline import run_build
    from search_engine_spark.session import get_spark, ship_package

    spark = get_spark("build-index")
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    pages_path = args.pages
    if pages_path is None:
        from search_engine_spark.sources.pages import cached_pages

        pages_path = str(cached_pages(args.synth_docs))

    # extraction is a narrow map: its parallelism = input splits.  Small
    # synthetic corpora come as one file which the default 128 MB split
    # size would carve into fewer pieces than cores; shrinking
    # maxPartitionBytes yields enough row-group-aligned splits WITHOUT the
    # full shuffle a repartition() would cost.  A real 100 TB lake has
    # plentiful splits and this clamp is a no-op.
    total_bytes = sum(
        f.stat().st_size for f in Path(pages_path).rglob("*")
        if f.is_file()
    ) if Path(pages_path).is_dir() else Path(pages_path).stat().st_size
    target = spark.sparkContext.defaultParallelism * 3
    split = max(1 << 20, min(128 << 20, total_bytes // target))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    t0 = time.perf_counter()
    cat = run_build(
        spark, pages, args.warehouse,
        num_shards=args.shards, salt_buckets=args.salt_buckets,
        merge_factor=args.merge_factor, force=args.force,
    )
    elapsed = time.perf_counter() - t0
    stats = cat.read("index_stats").collect()[0].asDict()
    print(json.dumps({
        "job": "build_index",
        "pages": n_pages,
        "seconds": round(elapsed, 3),
        "docs_per_sec": round(n_pages / elapsed, 2),
        "index_stats": {k: (float(v) if k == "avgdl" else int(v))
                        for k, v in stats.items()},
        "phases": [r["phase"] for r in cat.lineage_records()],
        # per-phase wall seconds (pipeline.timed) — the scaling harness
        # records these per level for the per-phase efficiency table
        "phase_seconds": {
            r["phase"]: r["seconds"]
            for r in cat.lineage_records() if "seconds" in r
        },
    }))


if __name__ == "__main__":
    main()
