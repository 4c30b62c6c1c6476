#!/usr/bin/env python
"""Freeze expected outputs for the three non-SQL-expressible engine
entries (engine_bm25_topk, engine_postings_sample, engine_batch_search)
into fixtures/golden_engine.json.

The entries exercise the reference-parity analyzer + the packed WAND
engine end-to-end over the deterministic 300-doc synthetic corpus; their
results are fully deterministic, so a frozen snapshot upgrades the
driver's rows-only check to a value-checked one: each entry re-verifies
itself against this file on every run (__spark_entry__._check_golden).

Regenerate ONLY on an intentional semantic change:
    python tools/gen_engine_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GOLDEN_PATH = Path(__file__).resolve().parents[1] / "fixtures/golden_engine.json"


def snapshot(df) -> list[list]:
    rows = []
    for r in df.collect():
        row = []
        for v in r:
            row.append(round(v, 9) if isinstance(v, float) else v)
        rows.append(row)
    return sorted(rows, key=lambda x: [str(c) for c in x])


def main() -> None:
    from search_engine_spark.session import get_spark

    import __spark_entry__ as e

    e._SKIP_GOLDEN_CHECK = True   # don't self-check while regenerating
    spark = get_spark("gen-goldens", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    qs = e.queries()
    old = (json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists()
           else {})
    out = {}
    drifted = []
    for name in ("engine_bm25_topk", "engine_postings_sample",
                 "engine_batch_search", "engine_phrase_topk",
                 "engine_near_topk", "engine_prefix_topk",
                 "engine_dynamic_topk"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        out[name] = {"columns": df.columns, "rows": snapshot(df)}
        if name in old and old[name] != json.loads(
            json.dumps(out[name], default=str)
        ):
            drifted.append(name)
        print(f"{name}: {len(out[name]['rows'])} rows frozen")
    if drifted and "--allow-drift" not in sys.argv:
        raise SystemExit(
            f"existing goldens changed: {drifted} — pass --allow-drift only "
            f"for an INTENTIONAL semantic change"
        )
    GOLDEN_PATH.write_text(json.dumps(out, indent=1, default=str))
    print(f"wrote {GOLDEN_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
