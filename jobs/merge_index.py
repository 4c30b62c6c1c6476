#!/usr/bin/env python
"""Merge job: (re)runs only the pack + shuffle-merge passes over an
existing warehouse's logical postings (SURVEY.md A6).

After appending new documents to ``postings``/``docmeta``, the stale
intermediates (postings_partial, doclens, index_stats, postings_packed)
must ALL be invalidated or the new postings never reach the packed index;
the job detects postings newer than postings_partial and drops them
automatically — ``--force`` does the same unconditionally.

  spark-submit --master 'local[32]' jobs/merge_index.py --warehouse /tmp/se_wh
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
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--merge-factor", type=int, default=None)
    ap.add_argument("--force", action="store_true",
                    help="drop packed tables and re-merge")
    args = ap.parse_args()

    from search_engine_spark.operators.merge import pack_and_merge
    from search_engine_spark.session import get_spark, ship_package
    from search_engine_spark.sources.catalog import IndexCatalog

    spark = get_spark("merge-index")
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")
    cat = IndexCatalog(spark, args.warehouse)

    def _stale() -> bool:
        # postings written after the partials ⇒ partials (and everything
        # derived: doclens, index_stats, packed) no longer cover the corpus
        src = cat.path("postings") / "_SUCCESS"
        part = cat.path("postings_partial") / "_SUCCESS"
        return (src.exists() and part.exists()
                and src.stat().st_mtime > part.stat().st_mtime)

    if args.force or _stale():
        if not args.force:
            print("postings newer than postings_partial — invalidating "
                  "stale intermediates", file=sys.stderr)
        for t in ("postings_partial", "doclens", "postings_packed",
                  "index_stats"):
            cat.drop(t)
    t0 = time.perf_counter()
    pack_and_merge(cat, num_shards=args.shards,
                   salt_buckets=args.salt_buckets,
                   merge_factor=args.merge_factor)
    elapsed = time.perf_counter() - t0
    n = cat.read("postings_packed").count()
    print(json.dumps({"job": "merge_index", "seconds": round(elapsed, 3),
                      "packed_rows": n}))


if __name__ == "__main__":
    main()
