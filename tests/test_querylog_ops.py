"""Pure-Python twins for the query-log mining entries: co-click query
similarity, QtfDf static cache admission, and session abandonment."""

import json
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, props FROM "
        f"read_parquet('{SF_DIR}/events.parquet') ORDER BY event_id"
    ).fetchall()


def test_coclick_matches_python_twin(spark):
    qi = set()
    for eid, _ts, uid, etype, props in _events():
        if etype != "click":
            continue
        k = json.loads(props).get("k")
        if k is not None:
            qi.add((uid % DQ._COCLICK_Q, int(k)))
    items = defaultdict(set)
    sizes = Counter()
    for q, it in qi:
        items[it].add(q)
        sizes[q] += 1
    co = Counter()
    for it, qs in items.items():
        qs = sorted(qs)
        for i, qa in enumerate(qs):
            for qb in qs[i + 1 :]:
                co[(qa, qb)] += 1
    sim = [
        (qa, qb, c, round(c / (sizes[qa] + sizes[qb] - c), 4))
        for (qa, qb), c in co.items()
    ]
    want = []
    for qa in sorted({r[0] for r in sim}):
        per = sorted(
            (r for r in sim if r[0] == qa), key=lambda r: (-r[3], r[1])
        )[: DQ._COCLICK_TOPN]
        want += [r + (i + 1,) for i, r in enumerate(per)]
    got = [
        (r.qa, r.qb, r.co, r.jaccard, r.rank)
        for r in DQ.q_coclick_similarity(spark, SF_DIR).collect()
    ]
    assert got == want
    assert all(0.0 < j <= 1.0 for _a, _b, _c, j, _r in got)


def test_cache_selection_matches_python_twin(spark):
    seeds = sorted(DQ._IL_SEEDS)
    qfreq = Counter()
    for eid, _ts, _uid, etype, _props in _events():
        if etype == "click":
            qfreq[seeds[eid % len(seeds)]] += 1
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    import re

    df = Counter()
    for _d, t in docs:
        toks = set(
            x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x
        )
        for s in seeds:
            if s in toks:
                df[s] += 1
    rows = sorted(
        (
            (s, qfreq[s], df[s], round(qfreq[s] / df[s], 4))
            for s in seeds
            if qfreq[s] and df[s]
        ),
        key=lambda r: (-r[3], r[0]),
    )
    want = [
        r + (i + 1, i + 1 <= DQ._CACHE_TOPN) for i, r in enumerate(rows)
    ]
    got = [
        (r.term, r.qfreq, r.df, r.qtf_df, r.rank, r.cached)
        for r in DQ.q_cache_selection(spark, SF_DIR).collect()
    ]
    assert got == want
    # exactly _CACHE_TOPN admitted
    assert sum(1 for r in got if r[5]) == min(DQ._CACHE_TOPN, len(got))


def test_abandonment_matches_python_twin(spark):
    by_user = defaultdict(list)
    for eid, ts, uid, etype, _props in _events():
        by_user[uid].append((ts, eid, etype))
    sessions = []
    for uid, evs in by_user.items():
        evs.sort()
        cur = None
        prev_ts = None
        for ts, _eid, etype in evs:
            if prev_ts is None or ((ts - prev_ts).days * 86_400_000_000
                       + (ts - prev_ts).seconds * 1_000_000
                       + (ts - prev_ts).microseconds) > 1_800_000_000:
                if cur:
                    sessions.append((uid, cur))
                cur = []
            cur.append(etype)
            prev_ts = ts
        if cur:
            sessions.append((uid, cur))
    coh = defaultdict(lambda: [0, 0])
    for uid, types in sessions:
        if "view" not in types:
            continue
        c = coh[uid % DQ._ABANDON_COHORTS]
        c[0] += 1
        if "click" not in types:
            c[1] += 1
    want = [
        (k, n, a, round(a / n, 4)) for k, (n, a) in sorted(coh.items())
    ]
    got = [
        (r.cohort, r.n_sessions, r.n_abandoned, r.abandon_rate)
        for r in DQ.q_query_abandonment(spark, SF_DIR).collect()
    ]
    assert got == want
    # a session count must never be below its abandoned count
    assert all(n >= a for _c, n, a, _r in got)
