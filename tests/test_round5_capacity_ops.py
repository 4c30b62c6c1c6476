"""Pure-Python twins for round-5 batch 35: ks_power_law,
erlang_capacity."""

import math

import duckdb

from search_engine_spark import driver_queries as DQ
from tests.test_round5_drift_graph_ops import _und_edges_and_nodes

SF_DIR = "/root/testdata/sf0.001"


def test_ks_power_law_matches_twin(spark):
    nodes, _und = _und_edges_and_nodes()
    n = len(nodes)
    # DIRECTED in-degrees, as q_hill_tail_index uses them
    indeg = {}
    for i in nodes:
        for m, b in DQ._PR_RULES:
            j = (m * i + b) % n
            if i != j:
                indeg.setdefault((i, j), True)
    deg = {}
    for (_i, j) in indeg:
        deg[j] = deg.get(j, 0) + 1
    tail = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))
    tail = tail[:DQ._HILL_TAIL_K]
    k = len(tail)
    xmin = min(d for _v, d in tail)
    alpha = 1.0 + k / sum(math.log(d / xmin) for _v, d in tail)
    asc = sorted(tail, key=lambda kv: (kv[1], kv[0]))
    dmax = 0.0
    by_d = {}
    for rank, (_v, d) in enumerate(asc, start=1):
        by_d.setdefault(d, [rank, rank])
        by_d[d][1] = rank
    for d, (lo, hi) in by_d.items():
        fmod = 1.0 - (d / xmin) ** (1.0 - alpha)
        dmax = max(
            dmax,
            abs(hi / k - fmod),
            abs(fmod - (lo - 1) / k),
        )
    r = DQ.q_ks_power_law(spark, SF_DIR).collect()[0]
    assert (r.k, r.x_min) == (k, xmin)
    assert r.alpha == round(alpha, 4)
    assert abs(r.ks_distance - dmax) < 1e-3
    assert 0.0 <= r.ks_distance <= 1.0


def test_erlang_capacity_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT epoch_us(ts) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    us = [u for (u,) in rows]
    lam = len(us) * 1e6 / (max(us) - min(us))
    a = lam * DQ._ERLANG_SERVICE_S
    got = DQ.q_erlang_capacity(spark, SF_DIR).collect()
    assert [r.c for r in got] == list(range(1, DQ._ERLANG_MAX_C + 1))
    prev_wait = None
    for r in got:
        c = r.c
        rho = a / c
        assert r.lambda_qps == round(lam, 4)
        assert r.utilization == round(rho, 4)
        if rho >= 1.0:
            assert r.p_wait is None and r.exp_wait_ms is None
            continue
        s0 = sum(a ** k / math.factorial(k) for k in range(c))
        top = a ** c / math.factorial(c)
        pw = top / ((1.0 - rho) * s0 + top)
        wq = pw * DQ._ERLANG_SERVICE_S / (c * (1.0 - rho)) * 1000.0
        assert abs(r.p_wait - pw) < 1e-3
        assert abs(r.exp_wait_ms - wq) < 1e-2
        assert 0.0 <= r.p_wait <= 1.0
        # adding servers can only shrink the wait
        if prev_wait is not None:
            assert r.exp_wait_ms <= prev_wait + 1e-9
        prev_wait = r.exp_wait_ms
