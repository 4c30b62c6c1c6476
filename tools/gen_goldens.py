#!/usr/bin/env python3
"""Generate golden fixtures by compiling and running the READ-ONLY reference
implementation at /root/reference (never copied — only executed).

Outputs (committed to fixtures/):
  fixtures/golden_stems.json    — {word: stem} from the reference stemmer
                                  (engine/lib/stemmer/stemmer.cpp:580-652)
  fixtures/golden_extract.json  — per-HTML-fixture parse results from the
                                  reference HtmlParser
                                  (engine/parser/HtmlParser.cpp:309-379)

These goldens are the arbiters for the byte-identity invariants
(BASELINE.json input_hint).  Build artifacts stay in /tmp.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
BUILD = Path("/tmp/golden_build")

sys.path.insert(0, str(REPO))

STEM_DRIVER = r"""
#include "stemmer.h"
#include <iostream>
#include <string>
int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::cout << Stemmer::stem(line) << "\n";
    }
    return 0;
}
"""

# Driver prints a JSON object per input file: words+flags, title words,
# title_chunk, links (+anchor text), base, english.
PARSE_DRIVER = r"""
#include "HtmlParser.h"
#include <fstream>
#include <iostream>
#include <sstream>
#include <vector>

static std::string jesc(const std::string& s) {
    std::string o;
    for (unsigned char c : s) {
        switch (c) {
        case '"': o += "\\\""; break;
        case '\\': o += "\\\\"; break;
        case '\n': o += "\\n"; break;
        case '\r': o += "\\r"; break;
        case '\t': o += "\\t"; break;
        default:
            if (c < 0x20) { char b[8]; snprintf(b, 8, "\\u%04x", c); o += b; }
            else o += (char)c;
        }
    }
    return o;
}

int main(int argc, char** argv) {
    std::ifstream f(argv[1], std::ios::binary);
    std::stringstream ss; ss << f.rdbuf();
    std::string html = ss.str();
    std::vector<char> buf(html.begin(), html.end());
    buf.push_back('\0');
    HtmlParser p(buf.data(), html.size());
    std::cout << "{\"words\":[";
    for (size_t i = 0; i < p.words_flags.size(); ++i) {
        if (i) std::cout << ",";
        std::cout << "[\"" << jesc(p.words_flags[i].word) << "\","
                  << (int)p.words_flags[i].flags << "]";
    }
    std::cout << "],\"title_words\":[";
    for (size_t i = 0; i < p.titleWords.size(); ++i) {
        if (i) std::cout << ",";
        std::cout << "\"" << jesc(p.titleWords[i]) << "\"";
    }
    std::cout << "],\"title_chunk\":\"" << jesc(p.title_chunk) << "\"";
    std::cout << ",\"links\":[";
    for (size_t i = 0; i < p.links.size(); ++i) {
        if (i) std::cout << ",";
        std::cout << "[\"" << jesc(p.links[i].URL) << "\",[";
        for (size_t j = 0; j < p.links[i].anchorText.size(); ++j) {
            if (j) std::cout << ",";
            std::cout << "\"" << jesc(p.links[i].anchorText[j]) << "\"";
        }
        std::cout << "]]";
    }
    std::cout << "],\"base\":\"" << jesc(p.base) << "\"";
    std::cout << ",\"english\":" << (p.english ? "true" : "false") << "}\n";
    return 0;
}
"""


def build_stemmer() -> Path:
    BUILD.mkdir(parents=True, exist_ok=True)
    drv = BUILD / "stem_driver.cpp"
    drv.write_text(STEM_DRIVER)
    exe = BUILD / "stem_driver"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}/engine/lib", str(drv),
         str(REF / "engine/lib/stemmer/stemmer.cpp"), "-o", str(exe)],
        check=True,
    )
    return exe


def build_parser() -> Path:
    BUILD.mkdir(parents=True, exist_ok=True)
    drv = BUILD / "parse_driver.cpp"
    drv.write_text(PARSE_DRIVER)
    exe = BUILD / "parse_driver"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}/engine/parser", str(drv),
         str(REF / "engine/parser/HtmlParser.cpp"),
         str(REF / "engine/parser/HtmlTags.cpp"),
         "-o", str(exe), "-lpthread"],
        check=True,
    )
    return exe


def gen_stem_goldens(exe: Path) -> None:
    from tests.wordlists import STEM_TEST_WORDS

    words = list(dict.fromkeys(STEM_TEST_WORDS))
    out = subprocess.run(
        [str(exe)], input="\n".join(words) + "\n",
        capture_output=True, text=True, check=True,
    )
    stems = out.stdout.split("\n")
    golden = {w: stems[i] for i, w in enumerate(words)}
    (REPO / "fixtures/golden_stems.json").write_text(
        json.dumps(golden, indent=0, sort_keys=True)
    )
    print(f"golden_stems.json: {len(golden)} words")


def gen_extract_goldens(exe: Path) -> None:
    from tests.html_fixtures import HTML_FIXTURES

    golden = {}
    for name, html in HTML_FIXTURES.items():
        fp = BUILD / "page.html"
        fp.write_bytes(html.encode("utf-8"))
        out = subprocess.run(
            [str(exe), str(fp)], capture_output=True, text=True, check=True,
            timeout=30,
        )
        golden[name] = json.loads(out.stdout)
    (REPO / "fixtures/golden_extract.json").write_text(
        json.dumps(golden, indent=1, sort_keys=True)
    )
    print(f"golden_extract.json: {len(golden)} html fixtures")


if __name__ == "__main__":
    gen_stem_goldens(build_stemmer())
    gen_extract_goldens(build_parser())
