"""Rank-identity (SURVEY.md §5.2 layer 5; the north-rule correctness gate):
engine top-10 (doc_id, score) must equal the frozen pure-Python BM25 oracle
rank-identically on the full query set, ties broken (score DESC, doc_id ASC).
"""

import pytest

from search_engine_spark.sources.queryset import QUERIES


def _run(engine, oracle, q, k=10, synonyms=False, tol=1e-12):
    got = [
        (r["doc_id"], r["score"])
        for r in engine.search(q, k=k, synonyms=synonyms).collect()
    ]
    exp = [(d, s) for d, s, _, _ in oracle.topk(q, k=k, synonyms=synonyms)]
    assert [d for d, _ in got] == [d for d, _ in exp], (
        f"query {q!r}: docs {got} vs {exp}"
    )
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=tol, abs=tol), (
            f"query {q!r} doc {gd}: score {gs} vs {es}"
        )


@pytest.mark.parametrize("qid,q", QUERIES)
def test_rank_identity(engine, oracle, qid, q):
    _run(engine, oracle, q)


# Real-vocabulary queries: every word below is (a) in the synthetic corpus
# vocabulary and (b) has a WordNet synset for its stem in the FULL 41k-line
# fixtures/synsets.txt (same provenance as the reference's
# query/synsets.txt: public WordNet noun synsets, query/dump_synsets.py).
# This proves expansion parity on real data, not just the old 50-line toy.
SYNONYM_QUERIES = [
    "connection", "search engine", "apple", "attention", "bias",
    "news", "retrieval", "inference", "adoption", "bonus",
    "detention", "size", "women", "teeth", "wolves",
    "signal cluster", "document ranking", "query engine",
    "apple | news", "attention - bias", "size (bonus | news)",
    "engine indexing", "hopeful singing",
]


@pytest.mark.parametrize("q", SYNONYM_QUERIES)
def test_rank_identity_with_synonyms(engine, oracle, q):
    _run(engine, oracle, q, synonyms=True)


@pytest.mark.parametrize("q", ["connection", "news retrieval", "apple | size"])
def test_rank_identity_with_synonyms_packed(packed_engine, oracle, q):
    _run(packed_engine, oracle, q, synonyms=True, tol=1e-9)


@pytest.mark.parametrize("qid,q", QUERIES)
def test_rank_identity_packed(packed_engine, oracle, qid, q):
    """The physical path (varbyte + block-max WAND + fallbacks) must be
    rank-identical to the oracle too; 1e-9 tolerance absorbs float addition
    order inside the kernel."""
    _run(packed_engine, oracle, q, tol=1e-9)


NONFLAT_QUERIES = [
    '"search engine"', '"index the documents"', '"search engine" ranking',
    "search - engine", "- search", "engine - (crawler | parser)",
    "search & (engine | crawler)", 'documents "index documents"',
]


@pytest.mark.parametrize("q", NONFLAT_QUERIES)
def test_rank_identity_packed_without_fallback(catalog, oracle, q):
    """Phrases/NOT/nesting must be served by the PACKED path alone — a
    fallback-less engine proves no silent logical-postings detour."""
    from search_engine_spark.plans.wand import PackedQueryEngine

    eng = PackedQueryEngine.from_catalog(catalog)
    eng.fallback = None
    _run(eng, oracle, q, tol=1e-9)


@pytest.mark.parametrize("q", ["connection", "news retrieval",
                               "attention - bias"])
def test_rank_identity_synonyms_packed_without_fallback(catalog, oracle, q):
    from search_engine_spark.plans.wand import PackedQueryEngine

    eng = PackedQueryEngine.from_catalog(catalog)
    eng.fallback = None
    _run(eng, oracle, q, synonyms=True, tol=1e-9)


def test_nonempty_results_for_head_terms(engine):
    assert engine.search("search").count() > 0
    assert engine.search("w0").count() > 0


def test_stopword_query_empty(engine):
    assert engine.search("the of and").count() == 0
