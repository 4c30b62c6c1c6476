"""Term pipeline shared by index build and query compile.

Mirrors the reference's Index::Insert semantics (Indexer.hpp:403-445):
* title words are stemmed and indexed under ``'@' + stem`` (AddTitle,
  Indexer.hpp:355-357) — the ``@`` decoration convention is kept 1:1;
* empty stems (stopwords) are dropped and consume NO position
  (Indexer.hpp:429-439) — positions number surviving terms only;
* per-doc position space is title terms first, then body terms, one
  contiguous 0-based sequence (the per-doc analogue of the reference's
  global location interval; see SURVEY.md §1.4 on why a global axis is
  unnecessary).
"""

from __future__ import annotations

from search_engine_spark.functions.htmlparse import ParseResult
from search_engine_spark.functions.stemmer import stem


def doc_terms(res: ParseResult) -> tuple[list[str], list[int], int]:
    """(terms, flags, n_title_terms) for one parsed doc.

    terms[i] is the surviving stem at position i ('@'-decorated for title
    terms); flags[i] is the style bitmask (always 0 for title terms, as
    AddTitle writes flags=0, Indexer.hpp:357).
    """
    terms: list[str] = []
    flags: list[int] = []
    for w in res.title_words:
        s = stem(w.decode("utf-8", "replace"))
        if s:
            terms.append("@" + s)
            flags.append(0)
    n_title = len(terms)
    for w, f in res.words:
        s = stem(w.decode("utf-8", "replace"))
        if s:
            terms.append(s)
            flags.append(f)
    return terms, flags, n_title
