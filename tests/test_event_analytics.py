"""Pure-Python twins for the event-analytics entries: retention cohorts,
last-touch attribution, and RFM quintile scoring."""

import json
import math
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT event_id, epoch(ts) AS es, user_id, event_type, value, "
        f"props FROM read_parquet('{SF_DIR}/events.parquet') "
        f"ORDER BY event_id"
    ).fetchall()


def test_retention_matches_python_twin(spark):
    ev = _events()
    first_signup = {}
    weeks = defaultdict(set)
    for _eid, es, uid, etype, _v, _p in ev:
        wk = int(es // DQ._RET_WEEK)
        weeks[uid].add(wk)
        if etype == "signup":
            first_signup[uid] = min(first_signup.get(uid, wk), wk)
    sizes = Counter(first_signup.values())
    active = Counter()
    for uid, cw in first_signup.items():
        for wk in weeks[uid]:
            off = wk - cw
            if 0 <= off <= DQ._RET_MAX_OFFSET:
                active[(cw, off)] += 1
    want = [
        (cw, off, sizes[cw], n, round(n / sizes[cw], 4))
        for (cw, off), n in sorted(active.items())
    ]
    got = [
        (r.cohort_wk, r.week_offset, r.n_users, r.n_active, r.retention)
        for r in DQ.q_retention_cohorts(spark, SF_DIR).collect()
    ]
    assert got == want
    # offset-0 retention is 1.0 by construction (signup week is active)
    assert all(r == 1.0 for _c, o, _n, _a, r in got if o == 0)
    # retention never exceeds the cohort size
    assert all(a <= n for _c, _o, n, a, _r in got)


def test_last_touch_matches_python_twin(spark):
    ev = _events()
    by_user = defaultdict(list)
    for eid, es, uid, etype, v, props in ev:
        if etype in ("click", "view", "purchase"):
            item = json.loads(props).get("k")
            by_user[uid].append(
                (es, eid, etype, v, int(item) if item is not None else None)
            )
    agg = defaultdict(lambda: [0, 0.0])
    for uid, rows in by_user.items():
        rows.sort()
        last = None
        for _es, _eid, etype, v, item in rows:
            if etype == "purchase":
                key = last if last is not None else -1
                agg[key][0] += 1
                agg[key][1] += v
            elif item is not None:
                last = item
    rows = sorted(
        ((k, n, round(s, 4)) for k, (n, s) in agg.items()),
        key=lambda r: (-r[2], r[0]),
    )[: DQ._RFM_TOPN]
    got = [
        (r.item, r.n_purchases, r.revenue)
        for r in DQ.q_last_touch(spark, SF_DIR).collect()
    ]
    assert got == rows


def test_rfm_matches_python_twin(spark):
    ev = _events()
    per = defaultdict(lambda: [0, 0, 0.0])  # last_es, freq, monetary
    for _eid, es, uid, etype, v, _p in ev:
        if etype != "purchase":
            continue
        c = per[uid]
        c[0] = max(c[0], es)
        c[1] += 1
        c[2] += v
    mx = max(c[0] for c in per.values())
    users = [
        (u, int((mx - c[0]) // 86400), c[1], round(c[2], 4))
        for u, c in per.items()
    ]
    n = len(users)
    q5 = lambda rank: 1 + math.floor(5 * (rank - 1) / n)
    r_rank = {u: i + 1 for i, (u, _r, _f, _m) in enumerate(
        sorted(users, key=lambda x: (x[1], x[0])))}
    f_rank = {u: i + 1 for i, (u, _r, _f, _m) in enumerate(
        sorted(users, key=lambda x: (-x[2], x[0])))}
    m_rank = {u: i + 1 for i, (u, _r, _f, _m) in enumerate(
        sorted(users, key=lambda x: (-x[3], x[0])))}
    scored = []
    for u, rd, fq, mon in users:
        r = 6 - q5(r_rank[u])
        f = 6 - q5(f_rank[u])
        m = 6 - q5(m_rank[u])
        scored.append((u, rd, fq, mon, r, f, m, 100 * r + 10 * f + m))
    want = sorted(scored, key=lambda x: (-x[7], x[0]))[: DQ._RFM_TOPN]
    got = [
        (r.user_id, r.recency_days, r.frequency, r.monetary,
         r.r_score, r.f_score, r.m_score, r.rfm)
        for r in DQ.q_rfm_scores(spark, SF_DIR).collect()
    ]
    assert got == want
    # every score lands in 1..5
    assert all(1 <= s <= 5 for row in got for s in row[4:7])
