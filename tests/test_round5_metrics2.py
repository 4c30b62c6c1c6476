"""Pure-Python twins for the round-5 closing additions: rbp_eval,
nqc_qpp, cocitation, elias_fano_cost, spam_mass."""

import math
import re
from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _edges():
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    edges = set()
    for i in ids:
        for m, b in DQ._PR_RULES:
            d = (m * i + b) % n
            if d != i:
                edges.add((i, d))
    return set(ids), edges


def _scored_pools(terms, k=None):
    """Per-term candidate lists [(doc_id, rounded_score)], descending by
    (score, -doc)-order, optionally cut to k — the twin of _scored."""
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", (t_ or "").lower()) if t]
        for d, t_ in rows
    }
    dls = {d: len(v) for d, v in toks.items() if v}
    n, avgdl = len(dls), sum(dls.values()) / len(dls)
    pools = {}
    for q in terms:
        tf = {d: v.count(q) for d, v in toks.items() if q in v}
        df = len(tf)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        scored = [
            (
                d,
                round(
                    idf * (f * 2.2)
                    / (f + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl)),
                    4,
                ),
            )
            for d, f in tf.items()
        ]
        scored.sort(key=lambda r: (-r[1], r[0]))
        pools[q] = scored[:k] if k else scored
    return pools


# ---------------------------------------------------------------------------
# rbp_eval
# ---------------------------------------------------------------------------

def test_rbp_eval_matches_twin(spark):
    p = DQ._RBP_PN / DQ._RBP_PD
    scale = DQ._RBP_PD ** (DQ._RBP_K - 1)
    want = {}
    for q, top in _scored_pools(DQ._NDCG_QS, DQ._RBP_K).items():
        num = 0
        n_rel = 0
        for i, (d, _s) in enumerate(top, start=1):
            rel = ((d % DQ._SPLIT_PRIME) * 2654435761) % 4 >= 2
            if rel:
                n_rel += 1
                num += DQ._RBP_PN ** (i - 1) * DQ._RBP_PD ** (DQ._RBP_K - i)
        want[q] = (
            n_rel,
            round((1.0 - p) * num / float(scale), 4),
            round(p ** DQ._RBP_K, 4),
        )
    got = {
        r.term: (r.n_rel, r.rbp, r.residual)
        for r in DQ.q_rbp_eval(spark, SF_DIR).collect()
    }
    assert got == want
    # RBP + residual can never exceed 1 (the metric's defining bound)
    for _n, rbp, res in got.values():
        assert 0.0 <= rbp <= rbp + res <= 1.0 + 1e-9


def test_rbp_perfect_ranking_approaches_one():
    # sanity on the closed form: all-relevant top-K = 1 - p^K
    p = DQ._RBP_PN / DQ._RBP_PD
    num = sum(
        DQ._RBP_PN ** (i - 1) * DQ._RBP_PD ** (DQ._RBP_K - i)
        for i in range(1, DQ._RBP_K + 1)
    )
    rbp = (1.0 - p) * num / float(DQ._RBP_PD ** (DQ._RBP_K - 1))
    assert abs(rbp - (1.0 - p ** DQ._RBP_K)) < 1e-12


# ---------------------------------------------------------------------------
# nqc_qpp
# ---------------------------------------------------------------------------

def test_nqc_qpp_matches_twin(spark):
    want = {}
    for q, cand in _scored_pools(DQ._IL_SEEDS).items():
        s4 = [int(round(s * 10000)) for _d, s in cand]
        top = sorted(
            zip(s4, [d for d, _ in cand]), key=lambda r: (-r[0], r[1])
        )[: DQ._NQC_K]
        k = len(top)
        s1 = sum(v for v, _ in top)
        s2 = sum(v * v for v, _ in top)
        sa = sum(s4)
        n = len(s4)
        # Spark/DuckDB round() is half-away-from-zero; Python's is
        # half-even — mean_top hits exact .5 boundaries (integer / 1e5)
        ha4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
        want[q] = (
            n,
            round(math.sqrt(k * s2 - s1 * s1) * n / (k * sa), 4),
            ha4(s1 / (k * 10000.0)),
        )
    got = {
        r.seed: (r.n_cand, r.nqc, r.mean_top)
        for r in DQ.q_nqc_qpp(spark, SF_DIR).collect()
    }
    assert got == want
    assert all(nqc >= 0.0 for _n, nqc, _m in got.values())


# ---------------------------------------------------------------------------
# cocitation
# ---------------------------------------------------------------------------

def test_cocitation_matches_twin(spark):
    _, edges = _edges()
    out_adj, in_adj = defaultdict(set), defaultdict(set)
    for s, d in edges:
        out_adj[s].add(d)
        in_adj[d].add(s)
    cocite, couple = defaultdict(int), defaultdict(int)
    for _s, dsts in out_adj.items():
        ds = sorted(dsts)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cocite[(ds[i], ds[j])] += 1
    for _d, srcs in in_adj.items():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                couple[(ss[i], ss[j])] += 1
    pairs = set(cocite) | set(couple)
    rows = sorted(
        (
            (a, b, cocite.get((a, b), 0), couple.get((a, b), 0))
            for a, b in pairs
        ),
        key=lambda r: (-(r[2] + r[3]), r[0], r[1]),
    )[: DQ._COCITE_TOPK]
    want = [(a, b, c, p, c + p) for a, b, c, p in rows]
    got = [
        (r.a, r.b, r.cocite, r.coupling, r.combined)
        for r in DQ.q_cocitation(spark, SF_DIR).collect()
    ]
    assert got == want
    # co-citation of (a,b) is |in(a) ∩ in(b)| — spot-check the top pair
    a, b, c, p, _ = got[0]
    assert c == len(in_adj[a] & in_adj[b])
    assert p == len(out_adj[a] & out_adj[b])


# ---------------------------------------------------------------------------
# elias_fano_cost
# ---------------------------------------------------------------------------

def test_elias_fano_cost_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", (t_ or "").lower()) if t]
        for d, t_ in rows
    }
    dfs = defaultdict(int)
    for _d, ts in toks.items():
        for t in set(ts):
            dfs[t] += 1
    u = sum(1 for ts in toks.values() if ts)
    buckets = defaultdict(lambda: [0, 0, 0])
    for _t, n in dfs.items():
        l = (u // n).bit_length() - 1
        ef_bits = n * l + n + u // (1 << l)
        b = buckets[n.bit_length() - 1]
        b[0] += 1
        b[1] += n
        b[2] += ef_bits
    want = {
        bk: (c, p, bits, round(bits / p, 4))
        for bk, (c, p, bits) in buckets.items()
    }
    got = {
        r.bucket: (r.n_lists, r.postings, r.ef_bits, r.bits_per_posting)
        for r in DQ.q_elias_fano_cost(spark, SF_DIR).collect()
    }
    assert got == want


def test_elias_fano_near_information_bound():
    # EF's defining guarantee: ≤ 2 + ceil(log2(U/n)) bits per element,
    # and never below the entropy bound log2(C(U, n)) / n.
    u = 10_000
    for n in (1, 7, 100, 5000, 9999):
        l = (u // n).bit_length() - 1
        bits = n * l + n + u // (1 << l)
        lo = (
            math.lgamma(u + 1) - math.lgamma(n + 1) - math.lgamma(u - n + 1)
        ) / math.log(2)
        assert lo <= bits <= n * (2 + max(0, math.ceil(math.log2(u / n)))) + u / (1 << l) + 1


# ---------------------------------------------------------------------------
# spam_mass
# ---------------------------------------------------------------------------

def test_spam_mass_consistent_with_pr_and_tr(spark):
    pr = {r.doc_id: r.pr for r in DQ.q_pagerank(spark, SF_DIR).collect()}
    tr = {r.doc_id: r.tr for r in DQ.q_trustrank(spark, SF_DIR).collect()}
    got = DQ.q_spam_mass(spark, SF_DIR).collect()
    assert {r.doc_id for r in got} == set(pr)
    for r in got:
        assert r.pr == pr[r.doc_id]
        assert r.tr == tr[r.doc_id]
        assert r.spam_mass == round((pr[r.doc_id] - tr[r.doc_id]) / pr[r.doc_id], 4)
        # relative spam mass is bounded above by 1 (tr >= 0, pr > 0)
        assert r.spam_mass <= 1.0


def test_spam_mass_twin_power_iteration(spark):
    ids, edges = _edges()
    n = len(ids)
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    d_ = DQ._PR_DAMP

    def iterate(tele):
        r = dict(tele)
        for _ in range(DQ._PR_ITERS):
            nxt = {i: (1 - d_) * tele[i] for i in ids}
            for s, dsts in out.items():
                share = d_ * r[s] / len(dsts)
                for dst in dsts:
                    nxt[dst] += share
            r = nxt
        return r

    pr = iterate({i: 1 / n for i in ids})
    seeds = [i for i in ids if i % DQ._BFS_SEED_MOD == 0]
    tr = iterate({i: (1 / len(seeds) if i in seeds else 0.0) for i in ids})
    got = {r.doc_id: r for r in DQ.q_spam_mass(spark, SF_DIR).collect()}
    for i in ids:
        assert abs(got[i].pr - pr[i]) < 1e-6
        assert abs(got[i].tr - tr[i]) < 1e-6
