"""Pure-Python twins for the LM-estimation entries: interpolated
Kneser-Ney bigram probabilities, Good-Turing counts-of-counts, and
stopword induction — plus the probability-mass invariants that make the
smoothers correct."""

import math
import re
from collections import Counter, defaultdict

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


def _bigrams():
    bi = Counter()
    for toks in _doc_tokens().values():
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    return bi


def test_kneser_ney_matches_python_twin(spark):
    bi = _bigrams()
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nt = len(bi)
    D = DQ._KN_D
    want = []
    for w1, w2 in sorted(DQ._KN_PROBES):
        c12 = bi.get((w1, w2), 0)
        p = (
            max(c12 - D, 0.0) / c1[w1]
            + D * n1f[w1] / c1[w1] * (n1b[w2] / nt)
        )
        want.append((w1, w2, c12, round(p, 4)))
    got = [
        (r.w1, r.w2, r.c12, r.p_kn)
        for r in DQ.q_kneser_ney(spark, SF_DIR).collect()
    ]
    assert got == want
    assert all(0.0 < p < 1.0 for _a, _b, _c, p in got)


def test_kneser_ney_mass_sums_to_one():
    # the invariant that makes KN a probability distribution: for any
    # history w1, sum over ALL observed w2 plus backoff mass == 1
    bi = _bigrams()
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nt = len(bi)
    D = DQ._KN_D
    w1 = max(c1, key=lambda w: c1[w])
    total = sum(
        max(bi[(a, b)] - D, 0.0) / c1[w1]
        + D * n1f[w1] / c1[w1] * (n1b[b] / nt)
        for (a, b) in bi
        if a == w1
    )
    # observed continuations cover sum(n1b)/nt of the continuation
    # distribution; add the unobserved-continuation backoff remainder
    cont_covered = sum(n1b[b] for (a, b) in bi if a == w1) / nt
    total += D * n1f[w1] / c1[w1] * (1.0 - cont_covered)
    assert abs(total - 1.0) < 1e-9


def test_good_turing_matches_python_twin(spark):
    bi = _bigrams()
    nr = Counter(bi.values())
    ntok = sum(bi.values())
    n1 = nr.get(1, 0)
    want = [
        (
            r,
            nr[r],
            nr.get(r + 1, 0),
            round((r + 1) * nr.get(r + 1, 0) / nr[r], 4),
            round(n1 / ntok, 4),
        )
        for r in sorted(nr)
        if 1 <= r <= DQ._GT_MAX_R
    ]
    got = [
        (r.r, r.n_r, r.n_r_plus_1, r.r_star, r.unseen_mass)
        for r in DQ.q_good_turing(spark, SF_DIR).collect()
    ]
    assert got == want
    # GT discounts: smoothed mass at r=1 must be below the raw count
    for r, n_r, n_r1, r_star, _p0 in got:
        assert r_star >= 0.0


def test_stopword_induction_matches_python_twin(spark):
    docs = _doc_tokens()
    df = Counter()
    for toks in docs.values():
        for t in set(toks):
            df[t] += 1
    n = len(docs)
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
        : DQ._STOP_TOPN
    ]
    want = [
        (
            t,
            d,
            round(d / n, 4),
            round(math.log((n - d + 0.5) / (d + 0.5) + 1.0), 4),
        )
        for t, d in ranked
    ]
    got = [
        (r.term, r.df, r.df_ratio, r.idf)
        for r in DQ.q_stopword_induction(spark, SF_DIR).collect()
    ]
    assert got == want
    # induced stopwords are the near-universal terms: idf ~ 0 relative
    # to a rare term's idf
    rare_idf = math.log((n - 1 + 0.5) / 1.5 + 1.0)
    assert all(i < rare_idf / 2 for _t, _d, _r, i in got)
