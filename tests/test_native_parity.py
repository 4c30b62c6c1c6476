"""C fast-path parity: se_native.parse_doc must produce IDENTICAL output
to the pure-Python extraction pipeline (parse_html + doc_terms + per-doc
agg) — the Python modules are the golden-verified source of truth, so any
divergence is a bug in the C.

Covers: the committed HTML fixtures, the synthetic corpus, and a seeded
random-soup fuzz (tools/fuzz_parity.py --native does the adversarial
long-run version against the compiled reference too)."""

from __future__ import annotations

import random

import pytest

from search_engine_spark.functions.htmlparse import extracted_text, parse_html
from search_engine_spark.functions.tokenize import doc_terms
from search_engine_spark.native import get_parse_doc

native = get_parse_doc()

pytestmark = pytest.mark.skipif(
    native is None, reason="no compiler for the native module here"
)


def py_reference(html: bytes) -> tuple:
    """The exact per-doc tuple operators/extract.py assembles."""
    res = parse_html(html)
    terms, flags, n_title = doc_terms(res)
    agg: dict = {}
    for i, (t, fl) in enumerate(zip(terms, flags)):
        e = agg.get(t)
        if e is None:
            agg[t] = [1, [i], [fl]]
        else:
            e[0] += 1
            e[1].append(i)
            e[2].append(fl)
    p_terms, p_tfs, p_flags, p_offs, p_poss, p_fposs = [], [], [], [], [], []
    off = 0
    for t, (tf, pos, fls) in agg.items():
        p_terms.append(t)
        p_tfs.append(tf)
        p_flags.append(max(fls))
        p_offs.append(off)
        p_poss.extend(pos)
        p_fposs.extend(fls)
        off += tf
    return (
        extracted_text(res), res.title_chunk, len(terms),
        p_terms, p_tfs, p_flags, p_offs, p_poss, p_fposs,
        n_title, len(res.words) + len(res.title_words),
        len(res.title_words), res.english,
        [u for u, _ in res.links],
    )


def norm_native(out: tuple) -> tuple:
    return tuple(list(v) if isinstance(v, list) else v for v in out[:13]) + (
        list(out[13]),
    )


def assert_same(html: bytes) -> None:
    a = py_reference(html)
    b = norm_native(native(html))
    assert a == b, f"native divergence on {html[:120]!r}"


def test_fixture_pages_match():
    from tests.html_fixtures import HTML_FIXTURES

    for name, html in HTML_FIXTURES.items():
        assert_same(html.encode("utf-8") if isinstance(html, str) else html)


def test_synthetic_corpus_matches():
    import pyarrow.parquet as pq

    from search_engine_spark.sources.pages import cached_pages

    rows = pq.read_table(cached_pages(200)).to_pylist()
    for r in rows:
        assert_same(bytes(r["html"]))


def test_random_soup_matches():
    rng = random.Random(1234)
    tags = ["<b>", "</b>", "<h2>", "</h2>", "<title>", "</title>", "<a href=\"x\">",
            "</a>", "<script>", "</script>", "<div>", "<", ">", "<unknown",
            "<embed src=\"u\">", "<!-- c -->", "<html lang=\"en\">",
            "<html lang=\"fr\">", "<svg>", "</svg>", "<style>", "</style>"]
    words = ["alpha", "beta", "running", "connection", "apples", "zz", "\t",
             "\n", " ", "w0", "'quote'", "end.", "Ärger", "\x0bvtab\x0c"]
    for _ in range(400):
        n = rng.randint(0, 60)
        parts = [rng.choice(tags) if rng.random() < 0.4 else rng.choice(words)
                 for _ in range(n)]
        html = " ".join(parts).encode("utf-8", "surrogateescape")
        assert_same(html)
    # pure byte soup
    for _ in range(100):
        html = bytes(rng.randrange(256) for _ in range(rng.randint(0, 400)))
        assert_same(html)


def test_title_body_and_flags_roundtrip():
    html = (b"<html lang=\"en\"><title>Search Engines</title>"
            b"<h1>Heading words</h1><b>bolded</b> plain search")
    out = norm_native(native(html))
    terms = out[3]
    assert any(t.startswith("@") for t in terms)
    # per-occurrence flags align with positions
    assert len(out[7]) == len(out[8]) == out[2]
