"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1).

Everything is seeded (seed=42, per-doc sub-seeds) — same n_docs → same bytes,
independent of batch boundaries or process count.  The ``text`` column is
produced by running the engine's own reference-parity parser over the
generated ``html``; the parity of that parser to the compiled reference is
asserted separately by tests/test_parser_golden.py, which is what makes
``text`` the byte-identity oracle for the extraction UDF.

Corpus properties (FIXTURES.md):
* vocabulary ~20k terms, Zipf(s≈1.07) — genuine head-term skew for the
  salting tests; mixes stopwords, irregular plurals, per-phase stemmer
  forms, punctuation-suffixed words, <3-char words, opaque ids;
* hosts Zipf over ~n/20 domains across the reference's 13 TLD classes;
  ~5% of paths contain a utility token (Ranker.cpp:110);
* body lengths log-normal (median ≈180, clamped [5, 5000]);
* ~2% of docs get ≥40 title words (exercises the title-length drop rule,
  Indexer.hpp:404-406); ~1% duplicate urls with different warc_ts
  (exercises first-wins dedup, HashBlob.h:105-116);
* lang: ~92% en, else de/fr/zz, mirrored into the <html lang> attribute.
"""

from __future__ import annotations

import datetime as dt
import math
import random
from pathlib import Path

from search_engine_spark.functions.htmlparse import extracted_text, parse_html

# FROZEN host-suffix pool: the corpus bytes must not change when the TLD
# schema evolves (cached parquet + goldens key on content) — includes
# suffixes outside the reference enum (mil/int/co/uk → UNKNOWN class)
_HOST_TLDS = [
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "co", "us", "uk", "info",
]

SEED = 42
EPOCH = dt.datetime(2025, 10, 17, tzinfo=dt.timezone.utc)

_UTILITY = ["privacy", "terms", "404", "error", "policy", "legal"]


def build_vocab(size: int = 20000) -> list[str]:
    """Deterministic vocabulary; index = Zipf rank (0 = most frequent)."""
    from tests.wordlists import STEM_TEST_WORDS  # same forms as the goldens

    base: list[str] = []
    seen = set()
    for w in STEM_TEST_WORDS:
        lw = w.lower()
        if lw not in seen and " " not in lw:
            seen.add(lw)
            base.append(lw)
    roots = [
        "search", "engine", "index", "query", "document", "rank", "score",
        "crawl", "parse", "token", "stem", "shard", "merge", "batch",
        "vector", "matrix", "signal", "filter", "cluster", "stream",
    ]
    sufs = ["", "s", "ed", "ing", "er", "est", "ation", "ly", "ness"]
    for r in roots:
        for s in sufs:
            w = r + s
            if w not in seen:
                seen.add(w)
                base.append(w)
    rng = random.Random(f"{SEED}:vocab")
    rng.shuffle(base)
    # Interleave real words into the Zipf head (every 3rd rank of the top
    # 3*len(base)), then opaque ids fill the tail — so generated text reads
    # like language while the long tail still stresses dictionary size.
    vocab: list[str] = []
    k = 0
    bi = 0
    while len(vocab) < size:
        if bi < len(base) and len(vocab) % 3 == 0:
            vocab.append(base[bi])
            bi += 1
        else:
            vocab.append(f"w{k}")
            k += 1
    return vocab[:size]


def zipf_cum_weights(n: int, s: float = 1.07) -> list[float]:
    cum = []
    tot = 0.0
    for r in range(1, n + 1):
        tot += 1.0 / (r**s)
        cum.append(tot)
    return cum


class PagesGenerator:
    def __init__(self, n_docs: int, seed: int = SEED, vocab_size: int = 20000):
        self.n_docs = n_docs
        self.seed = seed
        self.vocab = build_vocab(vocab_size)
        self.cum = zipf_cum_weights(len(self.vocab))
        self.total = self.cum[-1]
        n_hosts = max(4, n_docs // 20)
        hrng = random.Random(f"{seed}:hosts")
        self.hosts = [
            f"{self._host_name(hrng, i)}.{hrng.choice(_HOST_TLDS) if hrng.random() > 0.08 else 'zz'}"
            for i in range(n_hosts)
        ]
        self.host_cum = zipf_cum_weights(n_hosts, 1.2)
        self.host_total = self.host_cum[-1]

    @staticmethod
    def _host_name(rng: random.Random, i: int) -> str:
        syll = ["al", "bex", "cor", "dun", "el", "fam", "gos", "hin", "ix",
                "jor", "kal", "lum", "mer", "nov", "oz", "pel", "qua", "rys",
                "sol", "tav", "ul", "vex", "wim", "xan", "yel", "zor"]
        return "".join(rng.choice(syll) for _ in range(2 + i % 2)) + str(i)

    def _pick_term(self, rng: random.Random) -> str:
        import bisect

        x = rng.random() * self.total
        return self.vocab[bisect.bisect_left(self.cum, x)]

    def _pick_host(self, rng: random.Random) -> str:
        import bisect

        x = rng.random() * self.host_total
        return self.hosts[bisect.bisect_left(self.host_cum, x)]

    def url_of(self, i: int) -> str:
        rng = random.Random(f"{self.seed}:url:{i}")
        return self._gen_url(rng, i)

    def row(self, i: int) -> dict:
        rng = random.Random(f"{self.seed}:doc:{i}")
        lang = "en" if rng.random() < 0.92 else rng.choice(["de", "fr", "zz"])
        # ~1% duplicate the previous doc's url with a later warc_ts
        is_dup = i > 0 and rng.random() < 0.01
        url = self.url_of(i - 1) if is_dup else self.url_of(i)
        ts = EPOCH + dt.timedelta(seconds=i)
        html = self._gen_html(random.Random(f"{self.seed}:body:{i}"), i, lang)

        data = html.encode("utf-8")
        text = extracted_text(parse_html(data)).decode("utf-8")
        return {"url": url, "warc_ts": ts, "html": data, "text": text, "lang": lang}

    def _gen_url(self, rng: random.Random, i: int) -> str:
        host = self._pick_host(rng)
        segs = [self._pick_term(rng) for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.05:
            segs.insert(0, rng.choice(_UTILITY))
        return f"https://{host}/" + "/".join(segs) + f"/{i}"

    def _gen_html(self, rng: random.Random, i: int, lang: str) -> str:
        n_title = rng.randint(2, 8)
        if rng.random() < 0.02:
            n_title = rng.randint(40, 45)  # exercises the >=40 drop rule
        title = " ".join(self._pick_term(rng) for _ in range(n_title))

        n_body = int(math.exp(rng.gauss(5.2, 0.55)))
        n_body = max(5, min(5000, n_body))
        words = [self._pick_term(rng) for _ in range(n_body)]

        parts = [f'<!DOCTYPE html><html lang="{lang}"><head><title>{title}</title>']
        if rng.random() < 0.2:
            parts.append('<base href="https://base.example/">')
        if rng.random() < 0.3:
            parts.append("<style>body { margin: 0; }</style>")
        parts.append("</head><body>")

        j = 0
        while j < len(words):
            r = rng.random()
            take = min(rng.randint(3, 12), len(words) - j)
            chunk = " ".join(words[j : j + take])
            if r < 0.08:
                parts.append(f"<h{rng.randint(1, 6)}>{chunk}</h{rng.randint(1, 6)}>")
            elif r < 0.16:
                parts.append(f"<b>{chunk}</b>")
            elif r < 0.22:
                href = f"https://{self._pick_host(rng)}/{self._pick_term(rng)}"
                parts.append(f'<a href="{href}">{chunk}</a>')
            elif r < 0.26:
                parts.append(f"<!-- {chunk} -->")  # comment: words discarded
            elif r < 0.30:
                parts.append(f"<script>var x = '{chunk}';</script>")  # discarded
            elif r < 0.36:
                parts.append(f"<p>{chunk}</p>")
            else:
                parts.append(chunk)
            j += take
        parts.append("</body></html>")
        return "\n".join(parts)


def _gen_batch(args: tuple[int, int, int, int]) -> list[dict]:
    n_docs, seed, lo, hi = args
    gen = PagesGenerator(n_docs, seed)
    return [gen.row(i) for i in range(lo, hi)]


def write_pages_parquet(path: str | Path, n_docs: int, seed: int = SEED,
                        batch: int = 500, processes: int | None = None) -> Path:
    """Materialize the corpus to one parquet file (pyarrow, no Spark).

    Generation is per-doc seeded, so batches are embarrassingly parallel and
    the output is identical for any `processes`/`batch` choice.
    """
    import multiprocessing as mp

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    ranges = [
        (n_docs, seed, lo, min(lo + batch, n_docs))
        for lo in range(0, n_docs, batch)
    ]
    # write-aside + atomic rename: a synthesis killed mid-write must never
    # leave a footer-less parquet at the cache path (cached_pages trusts
    # existence), so the final path only ever holds a COMPLETE file
    import os

    tmp = path.with_suffix(path.suffix + ".tmp")
    writer = pq.ParquetWriter(tmp, schema, compression="zstd")
    if processes is None:
        processes = min(16, mp.cpu_count(), max(1, len(ranges)))
    if processes > 1 and len(ranges) > 1:
        with mp.Pool(processes) as pool:
            for rows in pool.imap(_gen_batch, ranges):
                writer.write_table(pa.Table.from_pylist(rows, schema=schema))
    else:
        for r in ranges:
            writer.write_table(pa.Table.from_pylist(_gen_batch(r), schema=schema))
    writer.close()
    os.replace(tmp, path)
    return path


def cached_pages(n_docs: int, seed: int = SEED, cache_dir: str | Path = "/tmp/se_pages") -> Path:
    p = Path(cache_dir) / f"pages_n{n_docs}_s{seed}.parquet"
    if not p.exists():
        write_pages_parquet(p, n_docs, seed)
    return p
