"""Faithful Python port of the reference stemmer (term-identity surface).

Semantics ported from ``/root/reference/engine/lib/stemmer/stemmer.cpp``
(lines cited per function).  This is NOT standard Porter2: the reference
deviates in ways that define term identity for the whole engine, so every
quirk is reproduced deliberately:

* ``Ruleset`` never actually sorts its rules by length — the constructor
  sorts the *moved-from* (empty) vector (``stemmer.cpp:141-150``), so each
  phase applies its suffix rules in **declaration order, first match wins**
  (e.g. phase2 rewrites ``rational → ration`` via the ``tional`` rule, not
  ``rate`` via ``ational``).
* phase2 takes ``r1`` but none of its choosers use it — suffix rewrites in
  phase2 apply regardless of R1 (``stemmer.cpp:355-434``).
* ``r1``/``r2`` are computed once, before phase0, on the apostrophe-stripped
  y-marked word, and reused as fixed *indices* while the word shrinks
  (``stemmer.cpp:636-649``).
* ``is_short_syllable(word, last)`` is always called on the final character,
  whose ``next == end()`` makes branch (a) unsatisfiable; the only way it
  returns true is the literal ``word == "past"`` special case
  (``stemmer.cpp:75-105``) — so ``hoping → hop`` (not ``hope``).
* phase6 (non-Porter2) strips ``er``/``est`` in R1 (``stemmer.cpp:563-571``).
* custom 42-word stoplist returns ``""`` (``stemmer.cpp:617-629``),
  33-entry irregular-plural exception map (``stemmer.cpp:582-616``),
  trailing-punctuation strip (``stemmer.cpp:581,625``), words shorter than
  3 chars pass through unchanged (``stemmer.cpp:634``).

The gold arbiter for this port is ``fixtures/golden_stems.json``, generated
once from the compiled reference stemmer (``tools/gen_goldens.py``).
"""

from __future__ import annotations

from functools import lru_cache

_PUNCT = frozenset(".,;:!?\")]}'")

_VOWELS = frozenset("aeiouy")  # note: capital 'Y' (marked y) is NOT a vowel

_DOUBLES = frozenset(("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"))

_LI_ENDINGS = frozenset("cdeghkmnrt")

EXCEPTIONS = {
    "children": "child", "women": "woman", "men": "man", "news": "news",
    "data": "data", "media": "media", "analysis": "analysis",
    "series": "series", "species": "species", "money": "money",
    "information": "information", "person": "person", "people": "people",
    "teeth": "tooth", "geese": "goose", "feet": "foot", "mice": "mouse",
    "indices": "index", "matrices": "matrix", "oxen": "ox", "dice": "die",
    "knives": "knife", "leaves": "leaf", "wives": "wife", "lives": "life",
    "thieves": "thief", "wolves": "wolf", "potatoes": "potato",
    "tomatoes": "tomato", "heroes": "hero", "echoes": "echo",
    "buses": "bus", "polite": "polite",
}

STOPWORDS = frozenset((
    "the", "a", "an", "and", "or", "but", "if", "with", "by", "on", "for",
    "in", "of", "to", "at", "is", "are", "was", "were", "be", "been",
    "being", "as", "it", "its", "this", "that", "these", "those", "he",
    "she", "they", "them", "his", "her", "their", "you", "your", "we",
    "our", "i", "me", "my",
))


def _is_vowel(ch: str) -> bool:
    return ch in "aeiouy"


def _contains_vowel(s: str) -> bool:
    return any(c in "aeiouy" for c in s)


def _find_r1(word: str) -> int:
    # stemmer.cpp:48-62 — first non-vowel after a vowel, +1; else len(word)
    found_vowel = False
    for i, c in enumerate(word):
        if _is_vowel(c):
            found_vowel = True
        elif found_vowel:
            return i + 1
    return len(word)


def _find_r1_r2(word: str) -> tuple[int, int]:
    r1 = _find_r1(word)
    r2 = _find_r1(word[r1:]) + r1
    return r1, r2


def _is_short_syllable_at(word: str, vow: int) -> bool:
    # stemmer.cpp:75-105; vow is an index into word
    found = False
    if vow != 0:
        nxt = vow + 1
        found = (
            nxt != len(word)
            and not _is_vowel(word[vow - 1])
            and _is_vowel(word[vow])
            and not _is_vowel(word[nxt])
            and word[nxt] not in ("w", "x", "Y")
        )
    else:
        nxt = vow + 1
        found = nxt != len(word) and _is_vowel(word[vow]) and not _is_vowel(word[nxt])
    if not found:
        found = word == "past"
    return found


def _is_short(word: str, r1: int) -> bool:
    # stemmer.cpp:107-111 — checked at the LAST character (see module doc)
    return _is_short_syllable_at(word, len(word) - 1) and len(word) <= r1


def _mark_y(word: str) -> str:
    # stemmer.cpp:126-139 — sequential scan; marked 'Y' is not a vowel for
    # subsequent positions
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    return "".join(chars)


def _apply_ruleset(word: str, rules) -> str:
    # stemmer.cpp:169-186 — declaration order, first match wins; a rule whose
    # suffix starts with ' ' is a generic match (any word long enough)
    for suffix, chooser in rules:
        ls = len(suffix)
        if len(word) < ls:
            continue
        last = word[-ls:]
        if last == suffix or suffix[0] == " ":
            stem = word[: len(word) - ls]
            return stem + chooser(stem, last)
    return word


def _phase0(word: str) -> str:
    # stemmer.cpp:188-202
    rules = (
        ("'s'", lambda st, suf: ""),
        ("'s", lambda st, suf: ""),
        ("'", lambda st, suf: ""),
    )
    return _apply_ruleset(word, rules)


def _phase1a(word: str) -> str:
    # stemmer.cpp:204-244 — note ws/us/ss no-ops and the stem>2 guard on 's'
    def ch_ied_ies(stem, suf):
        return "i" if len(stem) > 1 else "ie"

    def ch_s(stem, suf):
        if len(stem) > 2 and _contains_vowel(stem[:-1]):
            return ""
        return suf

    rules = (
        ("sses", lambda st, suf: "ss"),
        ("ied", ch_ied_ies),
        ("ies", ch_ied_ies),
        ("ws", lambda st, suf: suf),
        ("us", lambda st, suf: suf),
        ("ss", lambda st, suf: suf),
        ("s", ch_s),
    )
    return _apply_ruleset(word, rules)


def _phase1b(word: str, r1: int) -> tuple[str, bool]:
    # stemmer.cpp:246-290 — returns (word, deletion-happened flag)
    flag = [False]

    def ch_eed(stem, suf):
        return "ee" if r1 <= len(stem) else suf

    def ch_ed_ing(stem, suf):
        if _contains_vowel(stem):
            flag[0] = True
            return ""
        flag[0] = False
        return suf

    rules = (
        ("eed", ch_eed),
        ("eedly", ch_eed),
        ("ed", ch_ed_ing),
        ("edly", ch_ed_ing),
        ("ing", ch_ed_ing),
        ("ingly", ch_ed_ing),
    )
    out = _apply_ruleset(word, rules)
    return out, flag[0]


def _phase1b_del(word: str, r1: int) -> str:
    # stemmer.cpp:292-333 — trailing generic rule ("  ") appends 'e' only if
    # is_short(word), which (see module doc) requires word == "past" & r1==len
    def ch_at_bl_iz(stem, suf):
        return suf + "e"

    def ch_double(stem, suf):
        if not (len(stem) == 1 and stem[-1] in ("a", "e", "o")):
            return suf[:-1]
        return suf

    def ch_short(stem, suf):
        if _is_short(word, r1):
            return suf + "e"
        return suf

    rules = (
        ("at", ch_at_bl_iz),
        ("bl", ch_at_bl_iz),
        ("iz", ch_at_bl_iz),
        ("bb", ch_double), ("dd", ch_double), ("ff", ch_double),
        ("gg", ch_double), ("mm", ch_double), ("nn", ch_double),
        ("pp", ch_double), ("rr", ch_double), ("tt", ch_double),
        ("  ", ch_short),
    )
    return _apply_ruleset(word, rules)


def _phase1c(word: str) -> str:
    # stemmer.cpp:335-353
    def ch_y(stem, suf):
        if len(stem) > 1 and not _is_vowel(stem[-1]):
            return "i"
        return suf

    return _apply_ruleset(word, (("y", ch_y), ("Y", ch_y)))


def _phase2(word: str, r1: int) -> str:
    # stemmer.cpp:355-434 — r1 is accepted but unused (reference quirk)
    def ch_ogi(stem, suf):
        return "og" if stem and stem[-1] == "l" else suf

    def ch_li(stem, suf):
        return "" if stem and stem[-1] in _LI_ENDINGS else suf

    rules = (
        ("tional", lambda st, suf: "tion"),
        ("enci", lambda st, suf: "ence"),
        ("anci", lambda st, suf: "ance"),
        ("abli", lambda st, suf: "able"),
        ("entli", lambda st, suf: "ent"),
        ("izer", lambda st, suf: "ize"),
        ("ization", lambda st, suf: "ize"),
        ("ational", lambda st, suf: "ate"),
        ("ation", lambda st, suf: "ate"),
        ("ator", lambda st, suf: "ate"),
        ("alism", lambda st, suf: "al"),
        ("aliti", lambda st, suf: "al"),
        ("alli", lambda st, suf: "al"),
        ("fulness", lambda st, suf: "ful"),
        ("ousli", lambda st, suf: "ous"),
        ("ousness", lambda st, suf: "ous"),
        ("iveness", lambda st, suf: "ive"),
        ("iviti", lambda st, suf: "ive"),
        ("biliti", lambda st, suf: "ble"),
        ("bli", lambda st, suf: "ble"),
        ("ogi", ch_ogi),
        ("fulli", lambda st, suf: "ful"),
        ("lessli", lambda st, suf: "less"),
        ("li", ch_li),
    )
    return _apply_ruleset(word, rules)


def _bounded(chooser, bound):
    def ch(stem, suf):
        if bound <= len(stem):
            return chooser(stem, suf)
        return suf

    return ch


def _phase3(word: str, r1: int, r2: int) -> str:
    # stemmer.cpp:436-468
    remover = lambda st, suf: ""  # noqa: E731
    rules = (
        ("tional", _bounded(lambda st, suf: "tion", r1)),
        ("ational", _bounded(lambda st, suf: "ate", r1)),
        ("alize", _bounded(lambda st, suf: "al", r1)),
        ("icate", _bounded(lambda st, suf: "ic", r1)),
        ("iciti", _bounded(lambda st, suf: "ic", r1)),
        ("ical", _bounded(lambda st, suf: "ic", r1)),
        ("ful", _bounded(remover, r1)),
        ("ness", _bounded(remover, r1)),
        ("ative", _bounded(remover, r2)),
    )
    return _apply_ruleset(word, rules)


def _phase4(word: str, r2: int) -> str:
    # stemmer.cpp:470-526 — note the nonstandard 'ize' guard (kept if stem<5)
    remover = lambda st, suf: ""  # noqa: E731

    def ch_ion(stem, suf):
        if stem and stem[-1] in ("s", "t"):
            return ""
        return suf

    def ch_ize_safe(stem, suf):
        return "" if len(stem) >= 5 else "ize"

    rules = (
        ("al", _bounded(remover, r2)),
        ("ance", _bounded(remover, r2)),
        ("ence", _bounded(remover, r2)),
        ("er", _bounded(remover, r2)),
        ("ic", _bounded(remover, r2)),
        ("able", _bounded(remover, r2)),
        ("ible", _bounded(remover, r2)),
        ("ant", _bounded(remover, r2)),
        ("ement", _bounded(remover, r2)),
        ("ment", _bounded(remover, r2)),
        ("ent", _bounded(remover, r2)),
        ("ism", _bounded(remover, r2)),
        ("ate", _bounded(remover, r2)),
        ("iti", _bounded(remover, r2)),
        ("ous", _bounded(remover, r2)),
        ("ive", _bounded(remover, r2)),
        ("ize", _bounded(ch_ize_safe, r2)),
        ("ion", _bounded(ch_ion, r2)),
    )
    return _apply_ruleset(word, rules)


def _phase5(word: str, r1: int, r2: int) -> str:
    # stemmer.cpp:528-561
    def ch_e(stem, suf):
        if r2 <= len(stem):
            return ""
        if r1 <= len(stem) and not (
            stem and _is_short_syllable_at(stem, len(stem) - 1)
        ):
            return ""
        return suf

    def ch_l(stem, suf):
        return "" if stem and stem[-1] == "l" else suf

    return _apply_ruleset(word, (("e", ch_e), ("l", _bounded(ch_l, r2))))


def _phase6(word: str, r1: int) -> str:
    # stemmer.cpp:563-571 — nonstandard er/est strip in R1
    remover = lambda st, suf: ""  # noqa: E731
    return _apply_ruleset(
        word, (("er", _bounded(remover, r1)), ("est", _bounded(remover, r1)))
    )


@lru_cache(maxsize=1 << 20)
def stem(word: str) -> str:
    """Stem one (already lowercase) token; '' means dropped stopword.

    Entry sequence per stemmer.cpp:580-652.
    """
    w = word
    while w and w[-1] in _PUNCT:
        w = w[:-1]
    if not w:
        return w
    if w in STOPWORDS:
        return ""
    exc = EXCEPTIONS.get(w)
    if exc is not None:
        return exc
    if len(w) < 3:
        return w

    if w[0] == "'":
        w = w[1:]
    w = _mark_y(w)
    r1, r2 = _find_r1_r2(w)
    w = _phase0(w)
    w = _phase1a(w)
    w, flag = _phase1b(w, r1)
    if flag:
        w = _phase1b_del(w, r1)
    w = _phase1c(w)
    w = _phase2(w, r1)
    w = _phase3(w, r1, r2)
    w = _phase4(w, r2)
    w = _phase5(w, r1, r2)
    w = _phase6(w, r1)
    return w.replace("Y", "y")  # y_to_Y, stemmer.cpp:574-578


def stem_tokens(tokens) -> list[str]:
    """Vectorized-ish helper: stem an iterable of tokens (memoized)."""
    return [stem(t) for t in tokens]
