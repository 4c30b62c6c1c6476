"""Pure-Python twins for the round-5 closing batch 21: conversion_lag,
pagerank_convergence."""

import math
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _quantile_cont(vals, p):
    v = sorted(vals)
    h = p * (len(v) - 1)
    lo = math.floor(h)
    return v[lo] + (h - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])


def test_conversion_lag_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT user_id, event_id, event_type, epoch_us(ts) "
        f"FROM read_parquet('{SF_DIR}/events.parquet') "
        f"WHERE event_type IN ('signup', 'purchase')"
    ).fetchall()
    first_s = {}
    for u, eid, et, us in rows:
        if et == "signup":
            k = (us, eid)
            if u not in first_s or k < first_s[u]:
                first_s[u] = k
    lags = {}
    for u, _eid, et, us in rows:
        if et == "purchase" and u in first_s and us >= first_s[u][0]:
            lag = (us - first_s[u][0]) / 60_000_000.0
            if u not in lags or lag < lags[u]:
                lags[u] = lag
    r = DQ.q_conversion_lag(spark, SF_DIR).collect()[0]
    assert r.n_signup == len(first_s)
    assert r.n_converted == len(lags)
    assert r.conversion_rate == round(len(lags) / len(first_s), 4)
    assert abs(r.p50_lag_min - _quantile_cont(list(lags.values()), 0.5)) < 1e-2
    assert abs(r.p90_lag_min - _quantile_cont(list(lags.values()), 0.9)) < 1e-2
    # lags are forward in time by construction
    assert r.p50_lag_min >= 0 and r.p90_lag_min >= r.p50_lag_min


def test_pagerank_convergence_matches_twin(spark):
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    out = defaultdict(set)
    for i in range(n):
        for m, b in DQ._PR_RULES:
            d = (m * i + b) % n
            if d != i:
                out[i].add(d)
    d_ = DQ._PR_DAMP
    r = {i: 1 / n for i in range(n)}
    want = []
    for _t in range(DQ._PR_ITERS):
        nxt = {i: (1 - d_) / n for i in range(n)}
        for s, dsts in out.items():
            share = d_ * r[s] / len(dsts)
            for dd in dsts:
                nxt[dd] += share
        want.append(round(sum(abs(nxt[i] - r[i]) for i in range(n)), 4))
        r = nxt
    got = [
        (row.iteration, row.l1_residual, row.contraction)
        for row in DQ.q_pagerank_convergence(spark, SF_DIR).collect()
    ]
    assert [g[0] for g in got] == list(range(1, DQ._PR_ITERS + 1))
    for (it, l1, _c), w in zip(got, want):
        assert abs(l1 - w) < 2e-4, (it, l1, w)
    for (_i1, l1a, _c1), (_i2, l1b, c2) in zip(got, got[1:]):
        assert abs(c2 - round(l1b / l1a, 4)) < 2e-3
        # geometric contraction: every step shrinks by at least damping
        assert c2 <= DQ._PR_DAMP + 0.05
    # residual is strictly decreasing
    ls = [l1 for _i, l1, _c in got]
    assert ls == sorted(ls, reverse=True)
