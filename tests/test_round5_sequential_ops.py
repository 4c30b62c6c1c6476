"""Pure-Python twins for round-5 batch 26: sprt_stopping,
event_transitions, minhash_estimate_error."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_sprt_stopping_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT epoch_us(ts), event_id, event_type "
        f"FROM read_parquet('{SF_DIR}/events.parquet') ORDER BY 1, 2"
    ).fetchall()
    lr1 = math.log(DQ._SPRT_P1 / DQ._SPRT_P0)
    lr0 = math.log((1 - DQ._SPRT_P1) / (1 - DQ._SPRT_P0))
    bound = math.log((1 - DQ._SPRT_BETA) / DQ._SPRT_ALPHA)
    llr = 0.0
    up = dn = None
    clicks = 0
    for i, (_us, _eid, t) in enumerate(rows, start=1):
        x = t == "click"
        clicks += x
        llr += lr1 if x else lr0
        if up is None and llr >= bound:
            up = i
        if dn is None and llr <= -bound:
            dn = i
    stop = up if up is not None and (dn is None or up < dn) else dn
    decision = (
        "inconclusive" if stop is None
        else "accept_p1" if stop == up else "accept_p0"
    )
    r = DQ.q_sprt_stopping(spark, SF_DIR).collect()[0]
    assert r.n_total == len(rows)
    assert r.click_rate == round(clicks / len(rows), 4)
    assert r.stop_n == stop
    assert r.decision == decision
    assert r.boundary == round(bound, 4)
    # the SPRT must stop well before the fixed horizon on this stream
    if stop is not None:
        assert r.stop_frac < 1.0


def test_sprt_known_sequence():
    # closed form: a pure run of successes crosses the upper bound at
    # ceil(bound / lr1) observations
    lr1 = math.log(DQ._SPRT_P1 / DQ._SPRT_P0)
    bound = math.log((1 - DQ._SPRT_BETA) / DQ._SPRT_ALPHA)
    n = math.ceil(bound / lr1)
    llr = 0.0
    for i in range(1, n + 1):
        llr += lr1
    assert llr >= bound
    assert (n - 1) * lr1 < bound


def test_event_transitions_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT user_id, epoch_us(ts), event_id, event_type "
        f"FROM read_parquet('{SF_DIR}/events.parquet') ORDER BY 1, 2, 3"
    ).fetchall()
    per = defaultdict(list)
    for u, us, eid, t in rows:
        per[u].append(t)
    cnt = Counter()
    for seq in per.values():
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _b), c in cnt.items():
        tot[a] += c
    got = DQ.q_event_transitions(spark, SF_DIR).collect()
    assert [(r.from_type, r.to_type) for r in got] == sorted(cnt)
    for r in got:
        c = cnt[(r.from_type, r.to_type)]
        assert r.n == c
        assert r.prob == round(c / tot[r.from_type], 4)
    # each row of the matrix sums to ~1
    rows_sum = defaultdict(float)
    for r in got:
        rows_sum[r.from_type] += r.prob
    for s in rows_sum.values():
        assert abs(s - 1.0) < 5e-3


def test_minhash_estimate_error_matches_twin(spark):
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    sh = {}
    for d, txt in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        sh[d] = set(
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        )
    # df cap
    df = Counter()
    for s in sh.values():
        df.update(s)
    capped = {
        d: {g for g in s if df[g] <= DQ._SHINGLE_DF_CAP}
        for d, s in sh.items()
    }

    def mh(d):
        return [
            min(
                hashlib.md5(f"{i}:{g}".encode()).hexdigest()
                for g in sh[d]
            )
            for i in range(4)
        ]

    ids = sorted(sh)
    ests, trues = [], []
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            inter = len(capped[da] & capped[db])
            if not inter:
                continue
            j = inter / len(capped[da] | capped[db])
            if j < DQ._MHERR_MIN_J:
                continue
            a, b = mh(da), mh(db)
            ests.append(sum(x == y for x, y in zip(a, b)) / 4.0)
            trues.append(j)
    n = len(ests)
    r = DQ.q_minhash_estimate_error(spark, SF_DIR).collect()[0]
    assert r.n_pairs == n
    assert abs(r.mean_true_j - sum(trues) / n) < 1e-3
    assert abs(r.mean_estimate - sum(ests) / n) < 1e-3
    mae = sum(abs(e - t) for e, t in zip(ests, trues)) / n
    assert abs(r.mean_abs_err - mae) < 1e-3
    assert abs(r.bias - (sum(ests) - sum(trues)) / n) < 1e-3
