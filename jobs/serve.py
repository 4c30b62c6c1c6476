#!/usr/bin/env python
"""Q9: HTTP query entry point over a built warehouse (SURVEY.md §2.5).

The reference serves queries over HTTP from its in-memory index
(engine/server/LinuxTinyServer.cpp:441-520 accept/parse loop,
RootPlugin.h:87-214 /search plugin rendering results).  The Spark-native
equivalent keeps one long-lived SparkSession + PackedQueryEngine warm and
serves JSON from a stdlib ThreadingHTTPServer — queries reuse the
session, so per-request latency is the engine's job latency, not session
startup.

  spark-submit --master 'local[8]' jobs/serve.py --warehouse /tmp/se_wh \
      --port 8080

  GET /search?q=search+engine&k=10[&synonyms=1][&mode=bm25|static|dynamic]
      → {"query": ..., "results": [{doc_id, score, url, title}, ...]}
  GET /healthz → {"status": "ok", "n_docs": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_handler(engine, n_docs: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/healthz":
                self._send(200, {"status": "ok", "n_docs": n_docs})
                return
            if parsed.path != "/search":
                self._send(404, {"error": "unknown path"})
                return
            qs = urllib.parse.parse_qs(parsed.query)
            query = qs.get("q", [""])[0]
            if not query:
                self._send(400, {"error": "missing q"})
                return
            try:
                k = max(1, min(100, int(qs.get("k", ["10"])[0])))
                synonyms = qs.get("synonyms", ["0"])[0] in ("1", "true")
                mode = qs.get("mode", ["bm25"])[0]
                kwargs = {}
                if mode == "static":
                    kwargs["static_mode"] = True
                elif mode == "dynamic":
                    kwargs["dynamic_mode"] = True
                elif mode != "bm25":
                    self._send(400, {"error": f"unknown mode {mode!r}"})
                    return
                rows = engine.search(query, k=k, synonyms=synonyms,
                                     **kwargs).collect()
                self._send(200, {
                    "query": query,
                    "results": [
                        {"doc_id": r["doc_id"], "score": r["score"],
                         "url": r["url"], "title": r["title"]}
                        for r in rows
                    ],
                })
            except Exception as exc:  # engine errors → 500 with message
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(warehouse: str, port: int = 8080, master: str | None = None):
    """Build the engine once, return a ready-to-run HTTPServer (caller
    calls serve_forever(); tests drive it in a thread)."""
    from search_engine_spark.plans.wand import PackedQueryEngine
    from search_engine_spark.session import get_spark, ship_package
    from search_engine_spark.sources.catalog import IndexCatalog

    spark = get_spark("serve", master=master)
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")
    cat = IndexCatalog(spark, warehouse)
    engine = PackedQueryEngine.from_catalog(cat)
    n_docs = engine.n_docs
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine, n_docs))
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    httpd = serve(args.warehouse, args.port)
    print(json.dumps({"job": "serve", "port": args.port, "status": "ready"}),
          flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
