"""Pure-Python twins for round-5 batch 28: community_conductance,
shard_idf_divergence, embedding_drift."""

import math
import re
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ
from tests.test_round5_drift_graph_ops import _und_edges_and_nodes

SF_DIR = "/root/testdata/sf0.001"


def _lpa_labels(nodes, und):
    nbrs = defaultdict(set)
    for lo, hi in und:
        nbrs[lo].add(hi)
        nbrs[hi].add(lo)
    lbl = {i: i for i in nodes}
    for _ in range(DQ._LPA_ITERS):
        new = {}
        for i in nodes:
            if not nbrs[i]:
                new[i] = lbl[i]
                continue
            cnt = Counter(lbl[j] for j in nbrs[i])
            new[i] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lbl = new
    return lbl, nbrs


def test_community_conductance_matches_twin(spark):
    nodes, und = _und_edges_and_nodes()
    lbl, nbrs = _lpa_labels(nodes, und)
    m = len(und)
    vol, cut, nsz = Counter(), Counter(), Counter()
    for i in nodes:
        nsz[lbl[i]] += 1
    for lo, hi in und:
        vol[lbl[lo]] += 1
        vol[lbl[hi]] += 1
        if lbl[lo] != lbl[hi]:
            cut[lbl[lo]] += 1
            cut[lbl[hi]] += 1
    per = [
        (c, nsz[c], vol[c], cut.get(c, 0))
        for c in set(lbl.values()) if vol.get(c, 0) > 0
    ]
    per.sort(key=lambda r: (-r[1], r[0]))
    expected = [
        (c, n, v, k, round(k / min(v, 2 * m - v), 4))
        for c, n, v, k in per[:DQ._COND_TOPK]
    ]
    got = [
        (r.community, r.n_nodes, r.vol, r.cut, r.conductance)
        for r in DQ.q_community_conductance(spark, SF_DIR).collect()
    ]
    assert got == expected
    # conductance is a fraction of the smaller side's volume
    assert all(0.0 <= r[4] <= 1.0 for r in got)


def test_shard_idf_divergence_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    S = DQ._SIDF_SHARDS
    gdf, sdf = Counter(), Counter()
    ns = Counter()
    for d, txt in rows:
        ns[d % S] += 1
        terms = set(
            t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t
        )
        for t in terms:
            gdf[t] += 1
            sdf[(t, d % S)] += 1
    n = len(rows)
    top = sorted(gdf.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:DQ._SIDF_TOPK]
    got = DQ.q_shard_idf_divergence(spark, SF_DIR).collect()
    assert [(r.term, r.df) for r in got] == top
    for r in got:
        lidfs = [
            math.log(ns[s] / (sdf.get((r.term, s), 0) or 0.5))
            for s in range(S)
        ]
        assert r.global_idf == round(math.log(n / gdf[r.term]), 4)
        assert abs(r.min_local_idf - min(lidfs)) < 1e-3
        assert abs(r.max_local_idf - max(lidfs)) < 1e-3
        assert abs(r.spread - (max(lidfs) - min(lidfs))) < 2e-3
        assert r.spread >= 0


def test_embedding_drift_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding::DOUBLE[] "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    mid = max(v for v, _l, _e in rows) / 2.0
    sums = defaultdict(lambda: None)
    counts = Counter()
    for v, lab, e in rows:
        half = 1 if v < mid else 0
        k = (lab, half)
        counts[k] += 1
        if sums[k] is None:
            sums[k] = list(e)
        else:
            sums[k] = [a + b for a, b in zip(sums[k], e)]
    got = DQ.q_embedding_drift(spark, SF_DIR).collect()
    labels = sorted({lab for lab, _h in counts})
    assert [r.label for r in got] == labels
    for r in got:
        ca = [s / counts[(r.label, 1)] for s in sums[(r.label, 1)]]
        cb = [s / counts[(r.label, 0)] for s in sums[(r.label, 0)]]
        dot = sum(a * b for a, b in zip(ca, cb))
        na = math.sqrt(sum(a * a for a in ca))
        nb = math.sqrt(sum(b * b for b in cb))
        assert (r.n_first, r.n_second) == (
            counts[(r.label, 1)], counts[(r.label, 0)]
        )
        assert abs(r.centroid_cos - dot / (na * nb)) < 1e-3
        assert -1.0 <= r.centroid_cos <= 1.0
