"""Pure-Python twins for the round-5 closing batch 2: skip_cost_model,
perplexity_buckets, gopher_quality, filtered_ann, harmonic_centrality."""

import math
import re
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _toks():
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    return {
        d: [t for t in re.split(r"[^a-z0-9]+", (t_ or "").lower()) if t]
        for d, t_ in rows
    }


def _edges():
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    ids = list(range(n))
    edges = set()
    for i in ids:
        for m, b in DQ._PR_RULES:
            d = (m * i + b) % n
            if d != i:
                edges.add((i, d))
    return ids, edges


# ---------------------------------------------------------------------------
# skip_cost_model
# ---------------------------------------------------------------------------

def test_skip_cost_model_matches_twin(spark):
    toks = _toks()
    dfs = defaultdict(int)
    for _d, ts in toks.items():
        for t in set(ts):
            dfs[t] += 1
    want = []
    for qa, qb in sorted(DQ._SKIP_PAIRS):
        a, b = dfs[qa], dfs[qb]
        p, l = min(a, b), max(a, b)
        s = math.ceil(math.sqrt(l))
        skip = p * s + math.ceil(l / s)
        opt = math.ceil(2.0 * math.sqrt(p * l))
        want.append(
            (qa, qb, a, b, a + b, s, skip, opt,
             round(1.0 - skip / (a + b), 4), round(1.0 - opt / (a + b), 4))
        )
    got = [tuple(r) for r in DQ.q_skip_cost_model(spark, SF_DIR).collect()]
    assert got == want
    for row in got:
        # the optimal skip length can never cost more than the fixed one
        assert row[7] <= row[6]


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------

def _xents():
    toks = _toks()
    ct = defaultdict(int)
    for ts in toks.values():
        for t in ts:
            ct[t] += 1
    tot = sum(ct.values())
    out = {}
    for d, ts in toks.items():
        if not ts:
            continue
        x = sum(-math.log(ct[t] / tot) for t in ts) / len(ts)
        out[d] = (len(ts), round(x, 4))
    return out


def _quantile_cont(vals, p):
    v = sorted(vals)
    h = p * (len(v) - 1)
    lo = math.floor(h)
    return v[lo] + (h - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])


def test_perplexity_buckets_matches_twin(spark):
    xents = _xents()
    vals = [x for _n, x in xents.values()]
    t1 = _quantile_cont(vals, 0.3333333333333333)
    t2 = _quantile_cont(vals, 0.6666666666666666)
    want = {}
    for _d, (n, x) in xents.items():
        b = "head" if x <= t1 else ("middle" if x <= t2 else "tail")
        c = want.setdefault(b, [0, 0, math.inf, -math.inf])
        c[0] += 1
        c[1] += n
        c[2] = min(c[2], x)
        c[3] = max(c[3], x)
    got = {
        r.bucket: [r.n_docs, r.n_tokens, r.min_xent, r.max_xent]
        for r in DQ.q_perplexity_buckets(spark, SF_DIR).collect()
    }
    assert got == want
    # the CCNet partition is a partition: thirds cover the corpus
    assert sum(v[0] for v in got.values()) == len(xents)
    assert got["head"][3] <= got["middle"][2] <= got["middle"][3] <= got["tail"][2]


# ---------------------------------------------------------------------------
# gopher_quality
# ---------------------------------------------------------------------------

def test_gopher_quality_matches_twin(spark):
    stops = {s.strip("'") for s in DQ._EN_STOPS.strip("()").split(",")}
    want = {}
    for d, ts in _toks().items():
        if not ts:
            continue
        n = len(ts)
        chars = sum(len(t) for t in ts)
        alpha = sum(1 for t in ts if re.search(r"[a-z]", t))
        nstop = sum(1 for t in ts if t in stops)
        ok_w = DQ._GOPHER_MIN_WORDS <= n <= DQ._GOPHER_MAX_WORDS
        ok_m = (
            chars * 10 >= int(DQ._GOPHER_MIN_MWL * 10) * n
            and chars * 10 <= int(DQ._GOPHER_MAX_MWL * 10) * n
        )
        ok_a = alpha * 5 >= n * 4
        ok_s = nstop >= DQ._GOPHER_MIN_STOPS
        want[d] = (n, ok_w, ok_m, ok_a, ok_s,
                   ok_w and ok_m and ok_a and ok_s)
    got = {
        r.doc_id: (r.n_words, r.ok_words, r.ok_mean_len, r.ok_alpha,
                   r.ok_stops, r.keep)
        for r in DQ.q_gopher_quality(spark, SF_DIR).collect()
    }
    assert got == want
    # the battery must actually discriminate on this corpus
    keeps = [v[5] for v in got.values()]
    assert any(keeps) and not all(keeps)


# ---------------------------------------------------------------------------
# filtered_ann
# ---------------------------------------------------------------------------

def test_filtered_ann_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding::DOUBLE[] "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    q = next(e for v, _l, e in rows if v == 0)
    qn = math.sqrt(sum(x * x for x in q))
    scored = []
    for v, l, e in rows:
        if v == 0:
            continue
        dot = sum(a * b for a, b in zip(e, q))
        en = math.sqrt(sum(x * x for x in e))
        scored.append((v, l, round(dot / (en * qn), 4)))
    by_cos = sorted(scored, key=lambda r: (-r[2], r[0]))
    exact = {
        v
        for v, _l, _c in [
            r for r in by_cos if r[1] == DQ._FANN_LABEL
        ][: DQ._FANN_K]
    }
    want = []
    for m in DQ._FANN_OVERSAMPLE:
        head = by_cos[: m * DQ._FANN_K]
        kept = [v for v, l, _c in head if l == DQ._FANN_LABEL][: DQ._FANN_K]
        want.append(
            (m, len(kept), round(len(set(kept) & exact) / DQ._FANN_K, 4))
        )
    got = [
        (r.m, r.n_post, r.recall_at_k)
        for r in DQ.q_filtered_ann(spark, SF_DIR).collect()
    ]
    assert got == want
    # recall must be monotone non-decreasing in the oversample factor
    rs = [r for _m, _n, r in got]
    assert rs == sorted(rs)


# ---------------------------------------------------------------------------
# harmonic_centrality
# ---------------------------------------------------------------------------

def test_harmonic_centrality_matches_twin(spark):
    ids, edges = _edges()
    bwd = defaultdict(set)
    for s, d in edges:
        bwd[d].add(s)
    want = {}
    for seed in ids:
        if seed % DQ._BFS_SEED_MOD != 0:
            continue
        dist = {seed: 0}
        frontier = {seed}
        for t in range(1, DQ._HC_ITERS + 1):
            nxt = set()
            for v in frontier:
                for u in bwd[v]:
                    if u not in dist:
                        dist[u] = t
                        nxt.add(u)
            frontier = nxt
        h60 = sum(60 // d for d in dist.values() if d > 0)
        want[seed] = (len(dist) - 1, round(h60 / 60.0, 4))
    got = {
        r.seed: (r.n_reached, r.harmonic)
        for r in DQ.q_harmonic_centrality(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) >= 1
