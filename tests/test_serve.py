"""Q9 HTTP entry: the serving job must answer /search with the same
results as a direct engine call (LinuxTinyServer/RootPlugin analogue)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(catalog):
    from http.server import ThreadingHTTPServer

    from jobs.serve import make_handler
    from search_engine_spark.plans.wand import PackedQueryEngine

    engine = PackedQueryEngine.from_catalog(catalog)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(engine, engine.n_docs)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", engine
    httpd.shutdown()


def _get(url: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    base, engine = server
    code, body = _get(f"{base}/healthz")
    assert code == 200 and body["n_docs"] == engine.n_docs


def test_search_matches_engine(server):
    base, engine = server
    code, body = _get(f"{base}/search?q=search+engine&k=5")
    assert code == 200
    want = [
        (r["doc_id"], round(r["score"], 9), r["url"])
        for r in engine.search("search engine", k=5).collect()
    ]
    got = [(r["doc_id"], round(r["score"], 9), r["url"])
           for r in body["results"]]
    assert got == want


def test_search_phrase_and_modes(server):
    base, engine = server
    code, body = _get(f"{base}/search?q=%22search+engine%22&k=3")
    assert code == 200 and len(body["results"]) <= 3
    code, body = _get(f"{base}/search?q=search&k=3&mode=dynamic")
    assert code == 200
    want = [r["doc_id"]
            for r in engine.search("search", k=3, dynamic_mode=True).collect()]
    assert [r["doc_id"] for r in body["results"]] == want


def test_errors(server):
    base, _ = server
    assert _get(f"{base}/search")[0] == 400
    assert _get(f"{base}/search?q=x&mode=wat")[0] == 400
    assert _get(f"{base}/nope")[0] == 404
