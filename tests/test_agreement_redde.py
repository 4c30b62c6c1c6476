"""Pure-Python twins and invariants for the ranker-agreement metrics
(kendall_tau, rbo_overlap) and ReDDE sample-based shard selection."""

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


def _bm25_top(docs, terms, ids=None, k=10):
    """Rounded-score BM25 top-k over (a subset of) the corpus, mirroring
    the suite's round-4 / doc_id tie-break contract."""
    sub = {d: t for d, (t, _s) in docs.items() if ids is None or d in ids}
    dl = {d: len(t) for d, t in sub.items()}
    n = len(sub)
    avgdl = sum(dl.values()) / n
    tf = {q: Counter() for q in terms}
    for d, toks in sub.items():
        c = Counter(toks)
        for q in terms:
            if c[q]:
                tf[q][d] = c[q]
    score = Counter()
    for q in terms:
        df = len(tf[q])
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, f in tf[q].items():
            score[d] += round(
                idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)),
                4,
            )
    ranked = sorted(
        ((round(s, 4), d) for d, s in score.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [d for _s, d in ranked]


def _ql_top(docs, terms, k=10):
    """Dirichlet-QL (mu = DQ._COMB_MU) over the docs containing at least
    one query term — the same second run combsum_fusion fuses."""
    mu = DQ._COMB_MU
    dl = {d: len(t) for d, (t, _s) in docs.items()}
    total = sum(dl.values())
    ctf = Counter()
    tf = {q: Counter() for q in terms}
    for d, (toks, _s) in docs.items():
        c = Counter(toks)
        for q in terms:
            ctf[q] += c[q]
            if c[q]:
                tf[q][d] = c[q]
    p = {q: ctf[q] / total for q in terms}
    cand = set().union(*(set(tf[q]) for q in terms))
    score = {}
    for d in cand:
        score[d] = round(
            sum(
                math.log((tf[q].get(d, 0) + mu * p[q]) / (dl[d] + mu))
                for q in terms
            ),
            4,
        )
    ranked = sorted(
        ((s, d) for d, s in score.items()), key=lambda x: (-x[0], x[1])
    )[:k]
    return [d for _s, d in ranked]


def _twin_pair():
    docs = _docs()
    a = _bm25_top(docs, DQ._QL_TERMS, k=DQ._AGREE_DEPTH)
    b = _ql_top(docs, DQ._QL_TERMS, k=DQ._AGREE_DEPTH)
    ra = {d: i + 1 for i, d in enumerate(a)}
    rb = {d: i + 1 for i, d in enumerate(b)}
    return ra, rb


def test_kendall_tau_matches_python_twin(spark):
    ra, rb = _twin_pair()
    common = sorted(set(ra) & set(rb))
    conc = disc = 0
    for i, di in enumerate(common):
        for dj in common[i + 1 :]:
            s = (ra[di] - ra[dj]) * (rb[di] - rb[dj])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    n = len(common)
    want_tau = round((conc - disc) / (n * (n - 1) / 2), 4)
    row = DQ.q_kendall_tau(spark, SF_DIR).collect()[0]
    assert (row.concordant, row.discordant) == (conc, disc)
    assert row.tau == want_tau
    assert -1.0 <= row.tau <= 1.0


def test_rbo_matches_python_twin_and_bounds(spark):
    ra, rb = _twin_pair()
    k, p = DQ._AGREE_DEPTH, DQ._RBO_P
    rbo = 0.0
    for d in range(1, k + 1):
        ov = sum(1 for doc in ra if doc in rb and max(ra[doc], rb[doc]) <= d)
        rbo += (1 - p) * p ** (d - 1) * ov / d
    row = DQ.q_rbo_overlap(spark, SF_DIR).collect()[0]
    assert row.overlap_k == len(set(ra) & set(rb))
    assert row.rbo == round(rbo, 4)
    # truncated RBO is bounded by the d=k prefix mass
    assert 0.0 <= row.rbo <= round(1 - p**k, 4) + 1e-9


def test_rbo_identical_lists_hits_prefix_mass():
    # sanity on the formula itself: A == B -> overlap/d == 1 at every
    # depth, so truncated RBO == (1-p) * sum p^(d-1) == 1 - p^k
    k, p = DQ._AGREE_DEPTH, DQ._RBO_P
    full = sum((1 - p) * p ** (d - 1) for d in range(1, k + 1))
    assert abs(full - (1 - p**k)) < 1e-12


def test_redde_matches_python_twin(spark):
    docs = _docs()
    sample = {d for d in docs if d % DQ._REDDE_MOD == 0}
    top = _bm25_top(docs, DQ._QL_TERMS, ids=sample, k=DQ._REDDE_N)
    total = Counter(s for _t, s in docs.values())
    samp = Counter(docs[d][1] for d in sample)
    hits = Counter(docs[d][1] for d in top)
    rows = sorted(
        (
            (
                s,
                h,
                round(total[s] / samp[s], 4),
                round(h * total[s] / samp[s], 4),
            )
            for s, h in hits.items()
        ),
        key=lambda r: (-r[3], r[0]),
    )
    want = [r + (i + 1,) for i, r in enumerate(rows)]
    got = [
        (r.shard, r.n_hits, r.scale, r.redde_score, r.rank)
        for r in DQ.q_redde_selection(spark, SF_DIR).collect()
    ]
    assert got == want
    # every shard's estimate is its sample hits scaled by >= 1
    assert all(sc >= 1.0 for _s, _h, sc, _r, _k in got)
