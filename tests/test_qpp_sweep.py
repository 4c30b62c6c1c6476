"""Pure-Python twins for the pre-retrieval QPP predictors and the BM25
(k1, b) parameter sweep."""

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


def test_preret_qpp_matches_python_twin(spark):
    docs = _doc_tokens()
    n = len(docs)
    t = sum(len(v) for v in docs.values())
    want = []
    for s in sorted(DQ._IL_SEEDS):
        df = sum(1 for v in docs.values() if s in v)
        cf = sum(v.count(s) for v in docs.values())
        if not cf:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        want.append(
            (s, df, cf, round(idf, 4), round(math.log(t / cf), 4),
             round((1.0 + math.log(cf)) * idf, 4))
        )
    got = [
        (r.term, r.df, r.cf, r.idf, r.ictf, r.scq)
        for r in DQ.q_preret_qpp(spark, SF_DIR).collect()
    ]
    assert got == want
    # a rarer term must have the larger idf and ictf
    by_cf = sorted(got, key=lambda r: r[2])
    assert by_cf[0][4] >= by_cf[-1][4]


def test_bm25_sweep_matches_python_twin(spark):
    docs = _doc_tokens()
    n = len(docs)
    dl = {d: len(v) for d, v in docs.items()}
    avgdl = sum(dl.values()) / n
    tf = {q: Counter() for q in DQ._QL_TERMS}
    for d, v in docs.items():
        c = Counter(v)
        for q in DQ._QL_TERMS:
            if c[q]:
                tf[q][d] = c[q]
    want = []
    for k1, b in sorted(DQ._BM25_GRID):
        score = Counter()
        for q in DQ._QL_TERMS:
            df = len(tf[q])
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, f in tf[q].items():
                score[d] += round(
                    idf * f * (k1 + 1.0)
                    / (f + k1 * (1.0 - b + b * dl[d] / avgdl)),
                    4,
                )
        top = sorted(
            ((round(s, 4), d) for d, s in score.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        want += [
            (k1, b, i + 1, d, s) for i, (s, d) in enumerate(top)
        ]
    got = [
        (r.k1, r.b, r.rank, r.doc_id, r.score)
        for r in DQ.q_bm25_sweep(spark, SF_DIR).collect()
    ]
    assert got == want
    # b=0 kills length normalization: its scores must not depend on dl —
    # the top doc under b=0 has max sum of tf-saturation terms
    assert len({(k1, b) for k1, b, _r, _d, _s in got}) == len(DQ._BM25_GRID)
