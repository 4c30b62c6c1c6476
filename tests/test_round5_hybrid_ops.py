"""Pure-Python twin for round-5 batch 34: hybrid_weight_sweep."""

import math
import re
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _bm25_list(term):
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    tf = Counter()
    dl = {}
    df = Counter()
    for d, txt in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        dl[d] = len(toks)
        c = Counter(toks)
        for t in set(toks):
            df[t] += 1
        if term in c:
            tf[d] = c[term]
    n = len(rows)
    avgdl = sum(dl.values()) / n
    scored = []
    for d, f in tf.items():
        idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
        s = idf * (f * (DQ.K1 + 1.0)) / (
            f + DQ.K1 * (1.0 - DQ.B + DQ.B * dl[d] / avgdl)
        )
        scored.append((round(s, 4), d))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[:DQ._RRF_DEPTH]


def _sem_list():
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding::DOUBLE[] "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    qv = next(e for v, e in rows if v == 0)
    qn = math.sqrt(sum(x * x for x in qv))
    scored = []
    for v, e in rows:
        if v == 0:
            continue
        dot = sum(a * b for a, b in zip(e, qv))
        en = math.sqrt(sum(x * x for x in e))
        scored.append((round(dot / (en * qn), 4), v))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[:DQ._RRF_DEPTH]


def test_hybrid_weight_sweep_matches_twin(spark):
    lex = _bm25_list("merge")
    sem = _sem_list()

    def norm(lst):
        lo = min(s for s, _d in lst)
        hi = max(s for s, _d in lst)
        return {
            d: ((s - lo) / (hi - lo) if hi > lo else 1.0)
            for s, d in lst
        }

    nl, ns = norm(lex), norm(sem)
    lex10 = {d for _s, d in lex[:10]}
    sem10 = {d for _s, d in sem[:10]}
    docs = set(nl) | set(ns)
    got = DQ.q_hybrid_weight_sweep(spark, SF_DIR).collect()
    assert [r.lam for r in got] == list(DQ._HYBRID_LAMBDAS)
    for r in got:
        fused = sorted(
            (
                (-round(r.lam * nl.get(d, 0.0)
                        + (1 - r.lam) * ns.get(d, 0.0), 6), d)
                for d in docs
            )
        )[:10]
        top = [d for _f, d in fused]
        assert r.top1_doc == top[0]
        assert r.overlap_lex10 == len(set(top) & lex10)
        assert r.overlap_sem10 == len(set(top) & sem10)
    # the endpoints recover the pure lists exactly
    assert got[0].overlap_sem10 == 10      # lam = 0 -> pure semantic
    assert got[-1].overlap_lex10 == 10     # lam = 1 -> pure lexical
