"""Pure-Python twins for query-flow suggestions and MinDist proximity
ranking."""

import math
import re
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



def test_query_flow_matches_twin(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                     % {DQ._QF_MOD}
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for u, ts, eid, q in rows:
        by_user[u].append((ts, eid, q))
    edges = Counter()
    for u, lst in by_user.items():
        prev_ts, sid = None, 0
        seq = []
        for ts, eid, q in lst:
            if prev_ts is None or _usec(prev_ts, ts) > DQ._QF_GAP_S * 1_000_000:
                sid += 1
            seq.append((sid, q))
            prev_ts = ts
        for (s1, q1), (s2, q2) in zip(seq, seq[1:]):
            if s1 == s2 and q1 != q2:
                edges[(q1, q2)] += 1
    out = Counter()
    for (q1, _), w in edges.items():
        out[q1] += w
    want = []
    for q1 in sorted(out):
        tops = sorted(
            ((w, q2) for (a, q2), w in edges.items() if a == q1),
            key=lambda x: (-x[0], x[1]),
        )[: DQ._QF_TOPN]
        for r, (w, q2) in enumerate(tops, 1):
            want.append((q1, q2, w, out[q1], round(w / out[q1], 4), r))
    got = [
        (r.q, r.suggestion, r.w, r.out_total, r.prob, r.rank)
        for r in DQ.q_query_flow(spark, SF_DIR).collect()
    ]
    assert got == want
    # transition probabilities never exceed 1 and each source's top
    # suggestions are weakly decreasing in weight
    assert all(0 < p <= 1 for _, _, _, _, p, _ in got)


def test_term_proximity_matches_twin(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    docs = {
        d: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for d, t in rows
    }
    n = len(docs)
    dl = {d: len(v) for d, v in docs.items()}
    avgdl = sum(dl.values()) / n

    def bm25(t):
        tf = {d: v.count(t) for d, v in docs.items() if t in v}
        df = len(tf)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return {
            d: round(
                idf * (f * 2.2)
                / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)),
                4,
            )
            for d, f in tf.items()
        }

    got = DQ.q_term_proximity(spark, SF_DIR).collect()
    for a, b in DQ._WAND_PAIRS:
        pair = f"{a}+{b}"
        sa, sb = bm25(a), bm25(b)
        cand = []
        for d in set(sa) & set(sb):
            pos_a = [i + 1 for i, t in enumerate(docs[d]) if t == a]
            pos_b = [i + 1 for i, t in enumerate(docs[d]) if t == b]
            mind = min(abs(x - y) for x in pos_a for y in pos_b)
            boost = 1.0 / (1.0 + mind)
            cand.append(
                (round(sa[d] + sb[d] + boost, 4), d, mind, round(boost, 4))
            )
        want = sorted(cand, key=lambda x: (-x[0], x[1]))[: DQ._TP_K]
        rows_p = sorted(
            (r for r in got if r.pair == pair), key=lambda r: r.rank
        )
        assert [
            (r.final, r.doc_id, r.mindist, r.boost) for r in rows_p
        ] == want
        # adjacent terms get the max boost 0.5; boost decays with distance
        assert all(r.boost <= 0.5 for r in rows_p)
        assert all(r.mindist >= 1 for r in rows_p)
