"""Pure-Python twins for the round-5 closing batch 9: ivf_silhouette,
tail_at_scale, spearman_pr_opic, winsorized_mean."""

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


def _ivf_final():
    """Twin of _ivf_model: seed-assign, one Lloyd mean (rounded 6dp),
    re-assign."""
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding::DOUBLE[] "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    vecs = {v: e for v, e in rows}
    seeds = {cl: vecs[cl] for cl in range(1, DQ._IVF_K + 1)}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def assign(cents):
        out = {}
        for v, e in vecs.items():
            out[v] = min(
                cents, key=lambda cl: (d2(e, cents[cl]), cl)
            )
        return out

    a1 = assign(seeds)
    byc = defaultdict(list)
    for v, cl in a1.items():
        byc[cl].append(vecs[v])
    cents = {
        cl: [round(sum(xs) / len(xs), 6) for xs in zip(*members)]
        for cl, members in byc.items()
    }
    return vecs, assign(cents)


def test_ivf_silhouette_matches_twin(spark):
    vecs, asg = _ivf_final()

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    per_cell = defaultdict(list)
    for sid in range(DQ._SIL_SAMPLE):
        md = defaultdict(list)
        for oid, oe in vecs.items():
            if oid == sid:
                continue
            md[asg[oid]].append(dist(vecs[sid], oe))
        a = sum(md[asg[sid]]) / len(md[asg[sid]])
        b = min(
            sum(v) / len(v) for cl, v in md.items() if cl != asg[sid]
        )
        per_cell[asg[sid]].append((b - a) / max(a, b))
    want = {
        cl: (len(v), round(sum(v) / len(v), 4))
        for cl, v in per_cell.items()
    }
    got = {
        r.cl: (r.n_sampled, r.mean_silhouette)
        for r in DQ.q_ivf_silhouette(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for cl in want:
        assert got[cl][0] == want[cl][0]
        assert abs(got[cl][1] - want[cl][1]) < 1e-3
    # silhouette lives in [-1, 1]
    assert all(-1.0 <= v[1] <= 1.0 for v in got.values())


def test_tail_at_scale_matches_twin(spark):
    vals = [
        r[0]
        for r in duckdb.sql(
            f"SELECT value FROM read_parquet('{SF_DIR}/events.parquet')"
        ).fetchall()
    ]
    got = {
        r.fanout: (r.median_level, r.median_latency, r.p99_level,
                   r.p99_latency)
        for r in DQ.q_tail_at_scale(spark, SF_DIR).collect()
    }
    assert set(got) == set(DQ._TAS_FANOUTS)
    for k in DQ._TAS_FANOUTS:
        m, p = 0.5 ** (1.0 / k), 0.99 ** (1.0 / k)
        ml, mlat, pl, plat = got[k]
        assert ml == round(m, 6) and pl == round(p, 6)
        assert abs(mlat - _quantile_cont(vals, m)) < 1e-2
        assert abs(plat - _quantile_cont(vals, p)) < 1e-2
    # fan-out can only push latency up
    meds = [got[k][1] for k in sorted(got)]
    assert meds == sorted(meds)


def test_spearman_pr_opic_matches_twin(spark):
    pr = {
        r.doc_id: r.pr for r in DQ.q_pagerank(spark, SF_DIR).collect()
    }
    op = {
        r.doc_id: r.importance
        for r in DQ.q_opic_priority(spark, SF_DIR).collect()
    }
    ids = sorted(pr)
    rp = {
        d: i
        for i, d in enumerate(
            sorted(ids, key=lambda d: (-pr[d], d)), start=1
        )
    }
    ro = {
        d: i
        for i, d in enumerate(
            sorted(ids, key=lambda d: (-op[d], d)), start=1
        )
    }
    n = len(ids)
    sd2 = sum((rp[d] - ro[d]) ** 2 for d in ids)
    rho = 1.0 - 6.0 * sd2 / (n * (n * n - 1))
    row = DQ.q_spearman_pr_opic(spark, SF_DIR).collect()[0]
    assert row.n == n and row.sum_d2 == sd2
    assert row.spearman_rho == round(rho, 4)
    # OPIC exists to approximate PageRank's ordering — rho must be high
    assert row.spearman_rho > 0.9


def test_winsorized_mean_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT event_type, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for et, v in rows:
        per[et].append(v)
    got = {
        r.event_type: r
        for r in DQ.q_winsorized_mean(spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for et, vals in per.items():
        lo = _quantile_cont(vals, DQ._WINS_LO)
        hi = _quantile_cont(vals, DQ._WINS_HI)
        w = [max(lo, min(hi, v)) for v in vals]
        capped = sum(1 for v in vals if v < lo or v > hi)
        g = got[et]
        assert g.n == len(vals)
        assert abs(g.raw_mean - sum(vals) / len(vals)) < 1e-3
        assert abs(g.winsorized_mean - sum(w) / len(w)) < 1e-3
        assert abs(g.cap_lo - lo) < 1e-3 and abs(g.cap_hi - hi) < 1e-3
        assert abs(g.frac_capped - capped / len(vals)) < 1e-3
        # winsorizing pulls the mean toward the center, never past caps
        assert lo <= g.winsorized_mean <= hi
