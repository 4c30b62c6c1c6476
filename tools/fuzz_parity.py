#!/usr/bin/env python3
"""Differential fuzz of the byte-identity surfaces: random words through
the COMPILED reference stemmer, and random HTML soup through the COMPILED
reference parser (built by tools/gen_goldens.py into /tmp/golden_build),
compared field-by-field against the Python ports.

Usage: python tools/fuzz_parity.py [--stems 20000] [--pages 400] [--seed 1]
Exit code != 0 on any mismatch; writes repro files to /tmp/fuzz_repro_*.
"""

from __future__ import annotations

import argparse
import json
import random
import string
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BUILD = Path("/tmp/golden_build")
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

def rand_word(rng: random.Random) -> str:
    kind = rng.random()
    n = rng.randint(1, 14)
    if kind < 0.55:
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
    elif kind < 0.7:
        # realistic-ish suffixes exercise every stemmer phase
        root = "".join(rng.choice("abcdefghilmnoprstuvy") for _ in range(rng.randint(2, 7)))
        w = root + rng.choice(
            ["s", "es", "ies", "ed", "ing", "ly", "er", "est", "ation",
             "ization", "fulness", "iveness", "ational", "alize", "icate",
             "ement", "ant", "ous", "ive", "ize", "y", "eed", "eedly", ""]
        )
    elif kind < 0.8:
        w = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(n))
    elif kind < 0.9:
        w = "".join(rng.choice("abc'y") for _ in range(n))  # apostrophe/y paths
    else:
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(n)) + rng.choice(
            [".", ",", ";", ":", "!", "?", '"', ")", "]", "}", "'", "..", "?!"]
        )
    return w


TAGS = ["p", "b", "i", "h1", "h3", "h6", "title", "a", "script", "style",
        "svg", "div", "span", "em", "table", "td", "br", "img", "base",
        "embed", "html", "body", "head", "font", "big", "notarealtag",
        "averyveryverylongunknowntagname", "x"]


def rand_html(rng: random.Random) -> str:
    parts = []
    if rng.random() < 0.5:
        parts.append(f'<html lang="{rng.choice(["en", "en-US", "de", "zz", ""])}">')
    for _ in range(rng.randint(3, 40)):
        r = rng.random()
        words = " ".join(rand_word(rng) for _ in range(rng.randint(0, 8)))
        tag = rng.choice(TAGS)
        if r < 0.35:
            parts.append(words)
        elif r < 0.5:
            if tag == "a":
                parts.append(f'<a href="http://EX.com/{rand_word(rng)}">{words}</a>')
            elif tag == "base":
                parts.append(f'<base href="http://Base{rng.randint(0,9)}.org/">')
            elif tag == "embed":
                parts.append(f'<embed src="http://e.com/{rand_word(rng)}">')
            else:
                parts.append(f"<{tag}>{words}</{tag}>")
        elif r < 0.6:
            parts.append(f"<{tag} {rand_word(rng)}={rand_word(rng)}>{words}")
        elif r < 0.7:
            parts.append(f"<!-- {words} -->" if rng.random() < 0.7 else f"<!-- {words}")
        elif r < 0.8:
            # malformed: unclosed '<', stray '>', split tags
            parts.append(rng.choice([
                f"{words} < {rand_word(rng)}",
                f"{words} <",
                f"> {words}",
                f"<{rand_word(rng)}",
                f"{words}<{tag} unclosed {words}",
                f"</{tag} {words}",
                f"< {tag}>{words}",
            ]))
        elif r < 0.9:
            parts.append(f"<script>{words} </scr {words}</script>")
        else:
            parts.append(rng.choice(["\t", "\r\n", "  ", f"{words}\n{words}"]))
    sep = rng.choice([" ", "\n", ""])
    return sep.join(parts)


# ---------------------------------------------------------------------------
# runners
# ---------------------------------------------------------------------------

def fuzz_stems(n: int, rng: random.Random) -> int:
    from search_engine_spark.functions.stemmer import stem

    words = [rand_word(rng) for _ in range(n)]
    out = subprocess.run(
        [str(BUILD / "stem_driver")], input="\n".join(words) + "\n",
        capture_output=True, text=True, check=True,
    )
    ref = out.stdout.split("\n")
    bad = 0
    for i, w in enumerate(words):
        got = stem(w)
        if got != ref[i]:
            bad += 1
            if bad <= 10:
                print(f"STEM MISMATCH {w!r}: ours={got!r} ref={ref[i]!r}")
    return bad


def parse_to_json(html: bytes) -> dict:
    from search_engine_spark.functions.htmlparse import parse_html

    r = parse_html(html)
    d = lambda b: b.decode("utf-8", "replace")  # noqa: E731
    return {
        "words": [[d(w), f] for w, f in r.words],
        "title_words": [d(w) for w in r.title_words],
        "title_chunk": d(r.title_chunk),
        "links": [[d(u), [d(a) for a in at]] for u, at in r.links],
        "base": d(r.base),
        "english": r.english,
    }


def fuzz_pages(n: int, rng: random.Random) -> int:
    bad = 0
    ref_crashes = 0
    fp = BUILD / "fuzz_page.html"
    for i in range(n):
        html = rand_html(rng).encode("utf-8")
        fp.write_bytes(html)
        out = subprocess.run(
            [str(BUILD / "parse_driver"), str(fp)],
            capture_output=True, text=True, timeout=30,
        )
        if out.returncode != 0:
            # the REFERENCE parser aborts on some malformed soup (its own
            # bug class, like §2.9) — parity is only defined where it
            # terminates; our port must still not crash on the input
            ref_crashes += 1
            parse_to_json(html)
            continue
        ref = json.loads(out.stdout)
        got = parse_to_json(html)
        if got != ref:
            bad += 1
            repro = Path(f"/tmp/fuzz_repro_{i}.html")
            repro.write_bytes(html)
            if bad <= 5:
                for k in ref:
                    if got[k] != ref[k]:
                        print(f"PARSE MISMATCH page {i} field {k}: "
                              f"ours={got[k]!r:.300} ref={ref[k]!r:.300}")
                print(f"  repro: {repro}")
    if ref_crashes:
        print(f"  (reference parser crashed on {ref_crashes}/{n} inputs — "
              f"skipped, ours parsed them without error)")
    return bad


def fuzz_native(n: int, rng: random.Random) -> int:
    """Third surface: the C fast path (native/fastparse.c) vs the Python
    extraction pipeline over the same soup — the Python side is the
    golden-verified arbiter, so any divergence is a native bug."""
    from search_engine_spark.native import get_parse_doc
    from tests.test_native_parity import norm_native, py_reference

    native = get_parse_doc()
    if native is None:
        print("  (no compiler: native fuzz skipped)")
        return 0
    bad = 0
    for i in range(n):
        html = rand_html(rng).encode("utf-8")
        a = py_reference(html)
        b = norm_native(native(html))
        if a != b:
            bad += 1
            repro = Path(f"/tmp/fuzz_native_repro_{i}.html")
            repro.write_bytes(html)
            if bad <= 5:
                for j, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"NATIVE MISMATCH page {i} field {j}: "
                              f"py={x!r:.300} c={y!r:.300}")
                print(f"  repro: {repro}")
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stems", type=int, default=20000)
    ap.add_argument("--pages", type=int, default=400)
    ap.add_argument("--native", type=int, default=0,
                    help="also fuzz the C fast path vs Python on N pages")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    if not (BUILD / "stem_driver").exists() or not (BUILD / "parse_driver").exists():
        print("building reference drivers via tools/gen_goldens.py ...")
        import tools.gen_goldens as g

        g.build_stemmer()
        g.build_parser()

    rng = random.Random(args.seed)
    s_bad = fuzz_stems(args.stems, rng)
    p_bad = fuzz_pages(args.pages, rng)
    n_bad = fuzz_native(args.native, rng) if args.native else 0
    print(f"stems: {args.stems} words, {s_bad} mismatches")
    print(f"pages: {args.pages} docs, {p_bad} mismatches")
    if args.native:
        print(f"native: {args.native} docs, {n_bad} mismatches")
    sys.exit(1 if (s_bad or p_bad or n_bad) else 0)


if __name__ == "__main__":
    main()
