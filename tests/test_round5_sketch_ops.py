"""Pure-Python twins for the round-5 closing batch 14: kmv_sketch,
subsample_ci."""

import hashlib
import math
import re

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _md5i(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_kmv_sketch_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    grams = set()
    for (t,) in rows:
        ts = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for i in range(len(ts) - 1):
            grams.add(f"{ts[i]} {ts[i + 1]}")
    hashes = sorted(_md5i(g) for g in grams)
    k = min(DQ._KMV_K, len(hashes))
    hk = hashes[k - 1]
    est = (k - 1) * float(2 ** 32) / hk
    r = DQ.q_kmv_sketch(spark, SF_DIR).collect()[0]
    assert (r.k, r.kth_hash, r.d_exact) == (k, hk, len(grams))
    assert r.kmv_est == round(est, 4)
    assert r.rel_error == round((est - len(grams)) / len(grams), 4)
    # the estimator must land within a few sigma of truth (sigma≈1/√k)
    assert abs(r.rel_error) < 4 / math.sqrt(k)


def test_subsample_ci_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT event_id, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    n = len(rows)
    theta = sum(v for _e, v in rows) / n
    pivots = []
    for b in range(DQ._SUB_B):
        sub = [
            v for e, v in rows if _md5i(f"{e}:{b}") % 2 == 0
        ]
        tb = sum(sub) / len(sub)
        pivots.append(math.sqrt(len(sub)) * abs(tb - theta))
    sv = sorted(pivots)
    h = (1.0 - DQ._SUB_ALPHA) * (len(sv) - 1)
    lo = math.floor(h)
    q = sv[lo] + (h - lo) * (sv[min(lo + 1, len(sv) - 1)] - sv[lo])
    half = q / math.sqrt(n)
    r = DQ.q_subsample_ci(spark, SF_DIR).collect()[0]
    assert r.n == n and r.n_replicates == DQ._SUB_B
    assert abs(r.mean - theta) < 1e-3
    assert abs(r.half_width - half) < 1e-3
    assert abs(r.ci_lo - (theta - half)) < 2e-3
    assert abs(r.ci_hi - (theta + half)) < 2e-3
    # the CI must bracket the mean and be nondegenerate
    assert r.ci_lo < r.mean < r.ci_hi
