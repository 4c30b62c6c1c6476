"""Pure-Python twins for the pogo-sticking signal and link-graph degree
assortativity."""

import math
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _usec(a, b):
    """Exact microsecond difference — Spark unix_micros(b)-unix_micros(a)
    / DuckDB epoch_us(b)-epoch_us(a) semantics (integer microseconds,
    nothing truncated)."""
    td = b - a
    return (td.days * 86_400_000_000 + td.seconds * 1_000_000
            + td.microseconds)



def test_pogo_sticking_matches_twin(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, ts, event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for u, ts, eid, et, item in rows:
        by_user[u].append((ts, eid, et, item))
    clicks, pogo = Counter(), Counter()
    for u, lst in by_user.items():
        for i, (ts, eid, et, item) in enumerate(lst):
            if et != "click" or item is None:
                continue
            clicks[item] += 1
            if i + 1 < len(lst):
                dwell = _usec(ts, lst[i + 1][0])
                if dwell <= DQ._POGO_S * 1_000_000:
                    pogo[item] += 1
    want = sorted(
        (
            (round(pogo[i] / c, 4), i, c, pogo[i])
            for i, c in clicks.items()
            if c >= DQ._POGO_MIN
        ),
        key=lambda x: (-x[0], x[1]),
    )
    got = [
        (r.pogo_rate, r.item, r.n_clicks, r.n_pogo)
        for r in DQ.q_pogo_sticking(spark, SF_DIR).collect()
    ]
    assert got == want
    assert all(0.0 <= r <= 1.0 for r, *_x in got)


def test_degree_assortativity_matches_twin(spark):
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    edges = set()
    for i in ids:
        for m, b in DQ._PR_RULES:
            d = (m * i + b) % n
            if d != i:
                edges.add((i, d))
    outd, ind = Counter(), Counter()
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    xs = [outd[s] for s, d in edges]
    ys = [ind[d] for s, d in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    row = DQ.q_degree_assortativity(spark, SF_DIR).collect()[0]
    assert row.n_edges == m
    assert row.mean_outdeg == round(sx / m, 4)
    assert row.mean_indeg == round(sy / m, 4)
    assert row.assortativity == round(r, 4)
    # a correlation is bounded
    assert -1.0 <= row.assortativity <= 1.0
