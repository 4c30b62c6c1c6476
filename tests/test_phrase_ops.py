"""Pure-Python twins for query segmentation (Hagen naive scoring),
nextword-index stats, and anchor-text document expansion."""

import math
import re
from collections import Counter, defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _doc_tokens():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    return {
        d: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for d, t in rows
    }


def _gram_count(docs, gram):
    words = gram.split(" ")
    w = len(words)
    n = 0
    for toks in docs.values():
        for i in range(len(toks) - w + 1):
            if toks[i : i + w] == words:
                n += 1
    return n


def test_segmentation_matches_python_twin(spark):
    docs = _doc_tokens()
    segs = DQ._segmentations()
    freqs = {
        g: _gram_count(docs, g)
        for g in {g for _lbl, gs in segs for (g, _l) in gs}
    }
    scored = sorted(
        (
            (lbl, sum(l * freqs[g] for g, l in gs))
            for lbl, gs in segs
        ),
        key=lambda r: (-r[1], r[0]),
    )
    got = [
        (r.label, r.score)
        for r in DQ.q_query_segmentation(spark, SF_DIR).collect()
    ]
    assert got == scored
    assert len(got) == 2 ** (len(DQ._SEG_QUERY) - 1)
    # the all-singletons segmentation scores exactly 0
    singleton = "|".join(DQ._SEG_QUERY)
    assert dict(got)[singleton] == 0


def test_nextword_matches_python_twin(spark):
    docs = _doc_tokens()
    bi = defaultdict(Counter)
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            if a in DQ._IL_SEEDS:
                bi[a][b] += 1
    want = []
    for head in sorted(bi):
        c = bi[head]
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((head, len(c), sum(c.values()), top[0], top[1]))
    got = [
        (r.head, r.n_nextwords, r.n_instances, r.top_nextword, r.top_count)
        for r in DQ.q_nextword_index(spark, SF_DIR).collect()
    ]
    assert got == want


def test_anchor_expand_matches_python_twin(spark):
    docs = _doc_tokens()
    n = len(docs)
    # synthetic link graph + first-2-token anchors
    atf = Counter()
    for src, toks in docs.items():
        if DQ._ANCH_TERM not in toks[:2]:
            continue
        for m, b in DQ._PR_RULES:
            dst = (m * src + b) % n
            if dst != src:
                atf[dst] += 1
    ttf = Counter()
    for d, toks in docs.items():
        c = toks.count(DQ._ANCH_TERM)
        if c:
            ttf[d] = c
    dl = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dl.values()) / n
    cand = set(atf) | set(ttf)
    dfx = len(cand)
    idf = math.log((n - dfx + 0.5) / (dfx + 0.5) + 1.0)
    rows = []
    for d in cand:
        tfx = ttf.get(d, 0) + atf.get(d, 0)
        s = round(
            idf
            * (tfx * (DQ.K1 + 1.0))
            / (tfx + DQ.K1 * (1.0 - DQ.B + DQ.B * dl[d] / avgdl)),
            4,
        )
        rows.append((d, ttf.get(d, 0), atf.get(d, 0), s))
    want = sorted(rows, key=lambda r: (-r[3], r[0]))[:10]
    got = [
        (r.doc_id, r.tf_text, r.tf_anchor, r.score)
        for r in DQ.q_anchor_expand(spark, SF_DIR).collect()
    ]
    assert got == want
    # expansion is the point: at least one anchor-only doc must be
    # retrievable somewhere in the candidate set
    assert any(t == 0 and a > 0 for _d, t, a, _s in rows)
