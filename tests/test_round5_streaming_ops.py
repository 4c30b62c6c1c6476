"""Pure-Python twins for the round-5 closing batch 11:
late_arrival_stats, intersection_order_cost, mde_power."""

import itertools
import math
import re
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_late_arrival_stats_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT event_type, event_id, epoch_us(ts) "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for et, eid, us in rows:
        arr = us + ((eid * 2654435761) % DQ._LATE_JIT_S) * 1_000_000
        per[et].append((arr, eid, us))
    want = {}
    for et, evs in per.items():
        evs.sort()
        hwm = None
        n_late, mx = 0, 0
        for _arr, _eid, us in evs:
            late = max(hwm - us, 0) if hwm is not None else 0
            if late > DQ._LATE_WM_US:
                n_late += 1
            mx = max(mx, late)
            hwm = us if hwm is None else max(hwm, us)
        want[et] = (len(evs), n_late, mx, round(n_late / len(evs), 4))
    got = {
        r.event_type: (r.n_events, r.n_late, r.max_late_us, r.late_frac)
        for r in DQ.q_late_arrival_stats(spark, SF_DIR).collect()
    }
    assert got == want
    # the 2h jitter against a 1h watermark must produce real drops
    assert any(v[1] > 0 for v in got.values())


def test_intersection_order_cost_matches_twin(spark):
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    sets = {t: set() for t in DQ._ORD_TERMS}
    for d, t in docs:
        ts = set(
            x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x
        )
        for term in DQ._ORD_TERMS:
            if term in ts:
                sets[term].add(d)
    rows = []
    for p in itertools.permutations(DQ._ORD_TERMS):
        i2 = len(sets[p[0]] & sets[p[1]])
        rows.append(("->".join(p), len(sets[p[0]]), i2,
                     len(sets[p[0]]) + i2))
    rows.sort(key=lambda r: (r[3], r[0]))
    want = [
        (o, d1, i2, c, rank)
        for rank, (o, d1, i2, c) in enumerate(rows, start=1)
    ]
    got = [
        tuple(r)
        for r in DQ.q_intersection_order_cost(spark, SF_DIR).collect()
    ]
    assert got == want
    # rarest-first (ascending df start) must win
    best = got[0][0].split("->")[0]
    assert len(sets[best]) == min(len(v) for v in sets.values())


def test_mde_power_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT user_id, count(*) "
        f"FROM read_parquet('{SF_DIR}/events.parquet') "
        f"WHERE event_type = '{DQ._DM_NUM}' GROUP BY user_id"
    ).fetchall()
    xs = [c for _u, c in rows]
    n = len(xs)
    mean = sum(xs) / n
    var = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / n
    mde = (DQ._MDE_Z_ALPHA + DQ._MDE_Z_BETA) * math.sqrt(
        2 * var / (n / 2.0)
    )
    r = DQ.q_mde_power(spark, SF_DIR).collect()[0]
    assert r.n_per_arm == n // 2
    assert abs(r.metric_mean - mean) < 1e-3
    assert abs(r.metric_var - var) < 1e-3
    assert abs(r.mde_abs - mde) < 1e-3
    assert abs(r.mde_rel - mde / mean) < 1e-3
    # sanity: more users -> smaller detectable effect (the formula's
    # point); doubling n shrinks MDE by sqrt(2)
    mde_2n = (DQ._MDE_Z_ALPHA + DQ._MDE_Z_BETA) * math.sqrt(
        2 * var / n
    )
    assert mde_2n < r.mde_abs
