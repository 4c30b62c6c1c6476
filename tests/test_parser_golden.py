"""Parser byte-identity: Python port must equal the compiled reference
HtmlParser (fixtures/golden_extract.json) on every fixture, field by field."""

import json
from pathlib import Path

import pytest

from search_engine_spark.functions.htmlparse import extracted_text, parse_html
from tests.html_fixtures import HTML_FIXTURES

GOLDEN = json.loads(
    (Path(__file__).parent.parent / "fixtures/golden_extract.json").read_text()
)


def test_fixture_coverage():
    assert set(GOLDEN) == set(HTML_FIXTURES)
    assert len(GOLDEN) >= 40


@pytest.mark.parametrize("name", sorted(HTML_FIXTURES))
def test_parse_matches_reference(name):
    got = parse_html(HTML_FIXTURES[name].encode("utf-8"))
    exp = GOLDEN[name]

    got_words = [[w.decode("utf-8", "replace"), f] for w, f in got.words]
    assert got_words == [list(x) for x in exp["words"]], f"{name}: body words"

    got_title = [w.decode("utf-8", "replace") for w in got.title_words]
    assert got_title == exp["title_words"], f"{name}: title words"

    assert got.title_chunk.decode("utf-8", "replace") == exp["title_chunk"]

    got_links = [
        [u.decode("utf-8", "replace"), [a.decode("utf-8", "replace") for a in at]]
        for u, at in got.links
    ]
    assert got_links == [[u, list(a)] for u, a in exp["links"]], f"{name}: links"

    assert got.base.decode("utf-8", "replace") == exp["base"], f"{name}: base"
    assert got.english == exp["english"], f"{name}: english"


def test_extracted_text_is_joined_body_words():
    r = parse_html(b"<html><body>Alpha  Beta\nGamma</body></html>")
    assert extracted_text(r) == b"alpha beta gamma"
