"""Pure-Python twins for alpha-DCG diversity eval, Dunning LLR
collocations, and dictionary front-coding stats."""

import math
import re
from collections import Counter

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    return {
        d: ([x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x], s)
        for d, t, s in rows
    }


def test_alpha_dcg_matches_python_twin(spark):
    import tests.test_agreement_redde as agree

    docs = _docs()
    top = agree._bm25_top(
        {d: (t, s) for d, (t, s) in docs.items()}, DQ._QL_TERMS, k=10
    )
    seen = Counter()
    want, cum = [], 0.0
    for r, d in enumerate(top, start=1):
        src = docs[d][1]
        g = (1.0 - DQ._ADCG_ALPHA) ** seen[src] / math.log2(r + 1)
        cum += g
        want.append((r, d, src, seen[src], round(g, 4), round(cum, 4)))
        seen[src] += 1
    got = [
        (r.rank, r.doc_id, r.source, r.seen_before, r.gain, r.alpha_dcg)
        for r in DQ.q_alpha_dcg(spark, SF_DIR).collect()
    ]
    assert got == want
    # diversity discount never increases a gain beyond plain DCG's
    for r, _d, _s, seen_b, g, _c in got:
        assert g <= round(1.0 / math.log2(r + 1), 4) + 1e-9
        if seen_b > 0:
            assert g < 1.0 / math.log2(r + 1)


def _bigram_tables():
    bi = Counter()
    for toks, _s in _docs().values():
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    c1 = Counter()
    c2 = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        c2[b] += c
    return bi, c1, c2, sum(bi.values())


def test_llr_matches_python_twin(spark):
    bi, c1, c2, n = _bigram_tables()

    def llr(a, b):
        k11 = bi[(a, b)]
        k12 = c1[a] - k11
        k21 = c2[b] - k11
        k22 = n - c1[a] - c2[b] + k11
        s = 0.0
        for k, r, c in (
            (k11, c1[a], c2[b]),
            (k12, c1[a], n - c2[b]),
            (k21, n - c1[a], c2[b]),
            (k22, n - c1[a], n - c2[b]),
        ):
            if k > 0:
                s += k * math.log(k * n / (r * c))
        return 2.0 * s

    rows = sorted(
        ((a, b, bi[(a, b)], round(llr(a, b), 4)) for (a, b) in bi),
        key=lambda r: (-r[3], r[0], r[1]),
    )[: DQ._LLR_TOPN]
    got = [
        (r.w1, r.w2, r.c12, r.llr)
        for r in DQ.q_llr_collocations(spark, SF_DIR).collect()
    ]
    assert got == rows
    # LLR is a likelihood-ratio statistic: non-negative
    assert all(v >= 0 for _a, _b, _c, v in got)


def test_frontcoding_matches_python_twin(spark):
    vocab = sorted({t for toks, _s in _docs().values() for t in toks})
    lcps = [0]
    for prev, term in zip(vocab, vocab[1:]):
        k = 0
        while k < min(len(prev), len(term)) and prev[k] == term[k]:
            k += 1
        lcps.append(k)
    raw = sum(len(t) + 1 for t in vocab)
    front = sum(len(t) - l + 2 for t, l in zip(vocab, lcps))
    r = DQ.q_dict_frontcoding(spark, SF_DIR).collect()[0]
    assert (r.n_terms, r.raw_bytes, r.front_bytes) == (
        len(vocab), raw, front,
    )
    assert r.avg_lcp == round(sum(lcps) / len(vocab), 4)
    assert r.ratio == round(front / raw, 4)
