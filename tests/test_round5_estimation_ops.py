"""Pure-Python twins for the round-5 closing batch 10:
cardinality_estimation, chao1_vocab, srm_check."""

import hashlib
import re
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]


def test_cardinality_estimation_matches_twin(spark):
    terms = sorted({t for p in DQ._SKIP_PAIRS for t in p})
    docs_with = defaultdict(set)
    all_docs = set()
    for d, t in _docs():
        ts = set(_tok(t))
        if ts:
            all_docs.add(d)
        for x in terms:
            if x in ts:
                docs_with[x].add(d)
    n = len(all_docs)
    want = []
    for qa, qb in sorted(DQ._SKIP_PAIRS):
        a, b = len(docs_with[qa]), len(docs_with[qb])
        act = len(docs_with[qa] & docs_with[qb])
        est = a * b / n
        want.append(
            (qa, qb, a, b, act, round(est, 4),
             round(max(est / act, act / est), 4))
        )
    got = [
        tuple(r)
        for r in DQ.q_cardinality_estimation(spark, SF_DIR).collect()
    ]
    assert got == want
    # q-error is >= 1 by definition
    assert all(r[6] >= 1.0 for r in got)


def test_chao1_vocab_matches_twin(spark):
    grams_all, grams_sample = set(), defaultdict(int)
    for d, t in _docs():
        ts = _tok(t)
        for i in range(len(ts) - 1):
            g = f"{ts[i]} {ts[i + 1]}"
            grams_all.add(g)
            if d % 2 == 0:
                grams_sample[g] += 1
    d_s = len(grams_sample)
    f1 = sum(1 for c in grams_sample.values() if c == 1)
    f2 = sum(1 for c in grams_sample.values() if c == 2)
    est = d_s + f1 * f1 / (2.0 * max(f2, 1))
    r = DQ.q_chao1_vocab(spark, SF_DIR).collect()[0]
    assert (r.d_sample, r.f1, r.f2, r.d_full) == (
        d_s, f1, f2, len(grams_all)
    )
    assert r.chao1_est == round(est, 4)
    assert r.est_over_truth == round(est / len(grams_all), 4)
    # Chao1 only ever adds unseen mass on top of the observed count
    assert r.chao1_est >= r.d_sample


def test_srm_check_matches_twin(spark):
    users = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT user_id "
            f"FROM read_parquet('{SF_DIR}/events.parquet')"
        ).fetchall()
    }
    per = defaultdict(int)
    for u in users:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        per[h % DQ._SRM_BUCKETS] += 1
    t = sum(per.values())
    e = t / DQ._SRM_BUCKETS
    chi2 = sum((n - e) ** 2 / e for n in per.values())
    got = {
        r.bucket: (r.n, r.expected, r.chi2, r.srm_flag)
        for r in DQ.q_srm_check(spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for b, n in per.items():
        gn, ge, gc, gf = got[b]
        assert gn == n
        assert ge == round(e, 4)
        assert abs(gc - chi2) < 1e-3
        assert gf == (chi2 > 3.841)
    # a uniform md5 split over ~100 users must not trip SRM
    assert not any(v[3] for v in got.values())
