"""Pure-Python twins for Rank-S shard selection and Joachims
skip-above click preferences."""

import math
import re
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_ranks_selection_matches_twin(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    source = {d: s for d, s, _ in rows}
    sample = {
        d: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for d, _, t in rows
        if d % DQ._REDDE_MOD == 0
    }
    n = len(sample)
    dl = {d: len(v) for d, v in sample.items()}
    avgdl = sum(dl.values()) / n
    tot = defaultdict(float)
    for t in DQ._QL_TERMS:
        tf = {d: v.count(t) for d, v in sample.items() if t in v}
        df = len(tf)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, f in tf.items():
            tot[d] += round(
                idf * (f * (1.2 + 1.0))
                / (f + 1.2 * (1.0 - 0.75 + 0.75 * dl[d] / avgdl)),
                4,
            )
    ranked = sorted(
        ((round(s, 4), d) for d, s in tot.items()),
        key=lambda x: (-x[0], x[1]),
    )[: DQ._RANKS_N]
    votes, hits = Counter(), Counter()
    for r, (_, d) in enumerate(ranked, 1):
        votes[source[d]] += (1.0 / DQ._RANKS_B) ** r
        hits[source[d]] += 1
    want = sorted(
        ((round(v, 4), s) for s, v in votes.items()),
        key=lambda x: (-x[0], x[1]),
    )
    got = DQ.q_ranks_selection(spark, SF_DIR).collect()
    assert [(r.ranks_score, r.shard) for r in got] == want
    assert {r.shard: r.n_hits for r in got} == dict(hits)
    assert [r.rank for r in got] == list(range(1, len(want) + 1))
    # the rank-1 shard must hold the rank-1 sample hit: its 2^-1 vote
    # alone outweighs the sum of ALL deeper votes (geometric series)
    assert got[0].shard == source[ranked[0][1]]


def test_click_preferences_matches_twin(spark):
    rows = duckdb.sql(
        f"""SELECT event_type, user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT),
                   event_id % {DQ._CP_SLOTS} + 1
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('view', 'click')
              AND json_extract_string(props, '$.k') IS NOT NULL"""
    ).fetchall()
    views, clicked = {}, set()
    for et, u, item, pos in rows:
        if et == "view":
            k = (u, item)
            views[k] = min(views.get(k, pos), pos)
        else:
            clicked.add((u, item))
    by_user = defaultdict(list)
    for (u, item), pos in views.items():
        by_user[u].append((item, pos, (u, item) in clicked))
    prefs = Counter()
    for u, lst in by_user.items():
        for item, pos, c in lst:
            if not c:
                continue
            for item2, pos2, c2 in lst:
                if not c2 and pos2 < pos:
                    prefs[(item, item2)] += 1
    want = sorted(
        ((n, p, o) for (p, o), n in prefs.items()),
        key=lambda x: (-x[0], x[1], x[2]),
    )[: DQ._CP_TOPN]
    got = DQ.q_click_preferences(spark, SF_DIR).collect()
    assert [(r.n_prefs, r.preferred, r.over) for r in got] == want
    # every preferred item was clicked somewhere; every "over" item was
    # viewed-but-skipped by at least one user
    clicked_items = {i for _, i in clicked}
    skipped_items = {
        i for (u, i), _ in views.items() if (u, i) not in clicked
    }
    assert all(r.preferred in clicked_items for r in got)
    assert all(r.over in skipped_items for r in got)
