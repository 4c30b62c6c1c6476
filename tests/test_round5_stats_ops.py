"""Pure-Python twins for the round-5 closing batch 17:
anova_length_by_lang, hill_tail_index."""

import math
import re
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_anova_length_by_lang_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for l, t in rows:
        n = len([x for x in re.split(r"[^a-z0-9]+", (t or "").lower())
                 if x])
        if n:
            per[l].append(n)
    k = len(per)
    n = sum(len(v) for v in per.values())
    s = sum(sum(v) for v in per.values())
    q = sum(sum(x * x for x in v) for v in per.values())
    sb = sum(sum(v) ** 2 / len(v) for v in per.values())
    ssb = sb - s * s / n
    ssw = q - sb
    msb, msw = ssb / (k - 1), ssw / (n - k)
    f = msb / msw
    r = DQ.q_anova_length_by_lang(spark, SF_DIR).collect()[0]
    assert (r.k, r.n) == (k, n)
    assert abs(r.ms_between - msb) < 1e-2
    assert abs(r.ms_within - msw) < 1e-2
    assert abs(r.f_stat - f) < 1e-3
    assert r.significant == (f > 2.372)
    # partition of variance: SSB + SSW equals total SS exactly
    sst = q - s * s / n
    assert abs((ssb + ssw) - sst) < 1e-6


def test_hill_tail_index_matches_twin(spark):
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    ind = defaultdict(int)
    edges = set()
    for i in range(n_docs):
        for m, b in DQ._PR_RULES:
            d = (m * i + b) % n_docs
            if d != i:
                edges.add((i, d))
    for _s, d in edges:
        ind[d] += 1
    tail = sorted(ind.items(), key=lambda r: (-r[1], r[0]))[
        : DQ._HILL_TAIL_K
    ]
    k = len(tail)
    xmin = min(d for _v, d in tail)
    ls = sum(math.log(d / xmin) for _v, d in tail)
    alpha = 1.0 + k / ls
    r = DQ.q_hill_tail_index(spark, SF_DIR).collect()[0]
    assert (r.k, r.x_min) == (k, xmin)
    assert abs(r.alpha - alpha) < 1e-3
    assert abs(r.p_gt_2xmin - 2.0 ** (1 - alpha)) < 1e-3
    # a valid tail index is > 1 (finite mean requires it)
    assert r.alpha > 1.0
