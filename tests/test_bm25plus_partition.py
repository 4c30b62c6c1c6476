"""Pure-Python twins for BM25+ ranking and the partitioning cost model."""

import math
import re
from collections import Counter

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _doc_tokens():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    return {
        d: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for d, t in rows
    }


def test_bm25_plus_matches_twin_and_lower_bounds(spark):
    docs = _doc_tokens()
    n = len(docs)
    dl = {d: len(v) for d, v in docs.items()}
    avgdl = sum(dl.values()) / n
    t = DQ._BMP_SEED
    tf = {d: v.count(t) for d, v in docs.items() if t in v}
    df = len(tf)
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    rows = []
    for d, f in tf.items():
        sat = f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        rows.append(
            (d, dl[d], round(idf * sat, 4),
             round(idf * (sat + DQ._BMP_DELTA), 4))
        )
    by_plus = sorted(rows, key=lambda r: (-r[3], r[0]))
    by_base = sorted(rows, key=lambda r: (-r[2], r[0]))
    base_rank = {d: i for i, (d, *_r) in enumerate(by_base, 1)}
    want = [
        (d, ln, b, p, i, base_rank[d], base_rank[d] - i)
        for i, (d, ln, b, p) in enumerate(by_plus, 1)
    ][: DQ._BMP_K]
    got = [
        (r.doc_id, r.dl, r.bm25, r.bm25_plus, r.rank, r.rank_bm25,
         r.rank_shift)
        for r in DQ.q_bm25_plus(spark, SF_DIR).collect()
    ]
    assert got == want
    # the lower bound: every matching doc is worth at least idf*delta
    # more under BM25+ than under BM25, independent of length
    assert all(
        p >= b + round(idf * DQ._BMP_DELTA, 4) - 0.0002
        for _, _, b, p, *_x in got
    )


def test_partition_cost_matches_twin(spark):
    docs = _doc_tokens()
    terms = sorted({t for q in DQ._MS_QUERIES for t in q})
    df = {
        t: sum(1 for v in docs.values() if t in v) for t in terms
    }
    want = []
    for qt in DQ._MS_QUERIES:
        qname = "+".join(qt)
        shards = {len(t) % DQ._PC_SHARDS for t in qt}
        transfer = sum(df[t] for t in qt)
        doc_transfer = DQ._PC_SHARDS * DQ._PC_TOPK
        want.append(
            (qname, len(shards), transfer, DQ._PC_SHARDS, doc_transfer,
             "term" if transfer < doc_transfer else "doc")
        )
    want.sort()
    got = [
        (r.q, r.term_shards, r.term_transfer, r.doc_shards,
         r.doc_transfer, r.cheaper)
        for r in DQ.q_partition_cost(spark, SF_DIR).collect()
    ]
    assert got == want
    # on a head-term corpus the term-partitioned transfer (whole
    # posting lists) must dwarf doc-partitioned's shards*k rows
    assert all(r[2] > r[4] for r in got)
