"""Pure-Python twins for the round-5 closing batch 20: fano_factor,
hill_diversity."""

import math
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_fano_factor_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT event_type, date_trunc('hour', ts), count(*) "
        f"FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(list)
    for et, _h, x in rows:
        per[et].append(x)
    got = {
        r.event_type: r for r in DQ.q_fano_factor(spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for et, xs in per.items():
        n = len(xs)
        mean = sum(xs) / n
        var = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / n
        fano = var / mean
        band = 3.0 * math.sqrt(2.0 / n)
        verdict = (
            "overdispersed" if fano > 1 + band
            else "underdispersed" if fano < 1 - band
            else "poisson"
        )
        g = got[et]
        assert g.n_hours == n
        assert abs(g.mean - mean) < 1e-3
        assert abs(g.var - var) < 1e-3
        assert abs(g.fano - fano) < 1e-3
        assert g.verdict == verdict
        assert g.fano > 0


def test_hill_diversity_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT lang, source FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    got = {
        r.dimension: r
        for r in DQ.q_hill_diversity(spark, SF_DIR).collect()
    }
    for dim, idx in (("lang", 0), ("source", 1)):
        cnt = defaultdict(int)
        for r in rows:
            cnt[r[idx]] += 1
        t = sum(cnt.values())
        h = sum((c / t) * math.log(c / t) for c in cnt.values())
        s2 = sum((c / t) ** 2 for c in cnt.values())
        g = got[dim]
        assert g.n_docs == t and g.d0 == len(cnt)
        assert abs(g.d1 - math.exp(-h)) < 1e-3
        assert abs(g.d2 - 1.0 / s2) < 1e-3
        assert abs(g.evenness - math.exp(-h) / len(cnt)) < 1e-3
        # the Hill ordering 0D >= 1D >= 2D holds always
        assert g.d0 >= g.d1 - 1e-9 >= g.d2 - 2e-9
