"""Pure-Python twins for the round-5 closing batch 18:
classical_decomposition, head_churn."""

import datetime
import json
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_classical_decomposition_matches_twin(spark):
    days = duckdb.connect().execute(
        f"SELECT date_trunc('day', ts) AS day, count(*) "
        f"FROM read_parquet('{SF_DIR}/events.parquet') "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [x for _d, x in days]
    trend = [
        sum(xs[i - 3:i + 4]) / 7.0 if 3 <= i <= len(xs) - 4 else None
        for i in range(len(xs))
    ]
    det = defaultdict(list)
    for (d, x), t in zip(days, trend):
        if t is not None:
            det[(d.weekday() + 1) % 7].append(x - t)
    seas = {k: sum(v) / len(v) for k, v in det.items()}
    got = {
        str(r.day)[:10]: (r.x, r.trend, r.seasonal, r.residual)
        for r in DQ.q_classical_decomposition(spark, SF_DIR).collect()
    }
    assert len(got) == len(days)
    for (d, x), t in zip(days, trend):
        gx, gt, gs, gr = got[str(d)[:10]]
        dow = (d.weekday() + 1) % 7
        assert gx == x
        if t is None:
            assert gt is None and gr is None
        else:
            assert abs(gt - t) < 1e-3
            assert abs(gr - (x - t - seas[dow])) < 1e-2
        if dow in seas:
            assert abs(gs - seas[dow]) < 1e-3
    # the seasonal component is mean-zero across the fitted days by
    # construction (each detrended value contributes to its own mean)
    fitted = [
        (x - t, (d.weekday() + 1) % 7)
        for (d, x), t in zip(days, trend) if t is not None
    ]
    resid = [v - seas[dow] for v, dow in fitted]
    assert abs(sum(resid)) < 1e-6 * max(1, len(resid))


def test_head_churn_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT ts, props FROM read_parquet('{SF_DIR}/events.parquet') "
        f"WHERE event_type = 'click'"
    ).fetchall()
    t0 = min(
        ts.replace(hour=0, minute=0, second=0, microsecond=0)
        for ts, _p in rows
    )
    split = t0 + datetime.timedelta(days=DQ._CUPED_SPLIT_DAYS)
    per = defaultdict(lambda: defaultdict(int))
    for ts, props in rows:
        k = json.loads(props).get("k") if props else None
        if k is None:
            continue
        per[1 if ts < split else 2][int(k)] += 1
    tops = {}
    for h in (1, 2):
        tops[h] = dict(
            sorted(per[h].items(), key=lambda r: (-r[1], r[0]))[
                : DQ._CHURN_TOPK
            ]
        )
    items = set(tops[1]) | set(tops[2])
    inter = set(tops[1]) & set(tops[2])
    jac = round(len(inter) / len(items), 4)
    want = {}
    for i in items:
        a, b = tops[1].get(i, 0), tops[2].get(i, 0)
        status = "stayed" if a and b else ("dropped" if a else "entered")
        want[i] = (a, b, status, jac)
    got = {
        r.item: (r.n_first, r.n_second, r.status, r.jaccard)
        for r in DQ.q_head_churn(spark, SF_DIR).collect()
    }
    assert got == want
    # status counts reconcile with the Jaccard
    stayed = sum(1 for v in got.values() if v[2] == "stayed")
    assert round(stayed / len(got), 4) == jac
