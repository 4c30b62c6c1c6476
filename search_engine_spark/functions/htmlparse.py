"""Faithful Python port of the reference HTML parser (byte-identity surface).

Semantics ported rule-for-rule from
``/root/reference/engine/parser/HtmlParser.cpp`` and ``HtmlTags.cpp``
(file:line cited inline).  The gold arbiter is
``fixtures/golden_extract.json``, generated once from the COMPILED reference
parser over ``tests/html_fixtures.py``.

Deliberately reproduced quirks:

* the whole buffer is ASCII-lowercased before any parsing
  (HtmlParser.cpp:23-30,311) — hrefs and extracted text come out lowercase;
* unknown tag names of <= 20 chars return ``Discard``, NOT ``OrdinaryText``
  as the header comment claims; only names longer than ``LongestTagLength``
  take the OrdinaryText (broken-HTML salvage) path (HtmlTags.cpp:33-61,
  HtmlTags.h:204);
* ``<b>``/``<h1..h6>`` set style state even on a *closing* tag seen while
  that style is off — a stray ``</b>`` turns bold ON (HtmlParser.cpp:89-94
  runs before the recognized-closing-tag early return at :97-103);
* the main loop closes title/anchor/heading/bold on any closing tag whose
  name merely *starts with* ``title``/``a``/``h[1-6]``/``b``
  (HtmlParser.cpp:320-342), so ``</article>`` closes an open anchor;
* discard sections (``<script>/<style>/<svg>``) are exited only by their
  exact literal closing tag; otherwise the rest of the page is discarded
  (HtmlParser.cpp:279-307,343-355);
* the broken-tag salvage path merges an unclosed tag with the preceding
  word, bounded by the odd look-back limit ``ptr - strlen(ptr)``
  (HtmlParser.cpp:166-222) — i.e. index ``2*i - L``;
* anchor words are appended to BOTH the link's anchor text and the
  words/title list (HtmlParser.cpp:243-277); words salvaged from an
  unrecognized-but-closed tag are NOT added to anchor text
  (HtmlParser.cpp:207-221).

Everything operates on ``bytes``; like the reference, parsing is
byte-oriented and UTF-8-agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

# --- tag table: HtmlTags.h:46-202 -------------------------------------------
ORDINARY, TITLE, COMMENT, DISCARD, DISCARD_SECTION, ANCHOR, BASE, EMBED, HTML_TAG = range(9)

_SPECIAL = {
    b"!--": COMMENT,
    b"a": ANCHOR,
    b"base": BASE,
    b"embed": EMBED,
    b"html": HTML_TAG,
    b"title": TITLE,
    b"script": DISCARD_SECTION,
    b"style": DISCARD_SECTION,
    b"svg": DISCARD_SECTION,
}

_DISCARD_TAGS = (
    b"!doctype abbr acronym address applet area article aside audio b "
    b"basefont bdi bdo bgsound big blink blockquote body br button canvas "
    b"caption center cite code col colgroup content data datalist dd del "
    b"details dfn dialog dir div dl dt em fieldset figcaption figure font "
    b"footer form frame frameset h1 h2 h3 h4 h5 h6 head header hgroup hr i "
    b"iframe img input ins isindex kbd keygen label legend li link listing "
    b"main map mark marquee menu menuitem meta meter nav nobr noframes "
    b"noscript object ol optgroup option output p param picture plaintext "
    b"pre progress q rp rt rtc ruby s samp section select shadow slot small "
    b"source spacer span strike strong sub summary sup table tbody td "
    b"template textarea tfoot th thead time tr track tt u ul var video wbr "
    b"xmp"
).split()

TAG_ACTIONS = {t: DISCARD for t in _DISCARD_TAGS}
TAG_ACTIONS.update(_SPECIAL)

LONGEST_TAG_LENGTH = 20  # HtmlTags.h:204

_WS = frozenset(b" \t\n\r")  # HtmlParser.cpp:32-34
_HEADINGS = frozenset((b"h1", b"h2", b"h3", b"h4", b"h5", b"h6"))


def lookup_tag(name: bytes) -> int:
    """HtmlTags.cpp:33-61 — exact match; >20 chars → OrdinaryText; miss → Discard."""
    if len(name) > LONGEST_TAG_LENGTH:
        return ORDINARY
    return TAG_ACTIONS.get(name, DISCARD)


def _flags(in_bold: bool, in_heading: bool) -> int:
    # HtmlParser.cpp:36-42; largeFont (bit2) is never set by any call site
    return (1 if in_bold else 0) | (2 if in_heading else 0)


def _extract_attribute(content: bytes, attribute: bytes) -> bytes:
    # HtmlParser.cpp:44-55
    key = attribute + b'="'
    start = content.find(key)
    if start != -1:
        start += len(key)
        end = content.find(b'"', start)
        if end != -1:
            return content[start:end]
    return b""


class ParseResult(NamedTuple):
    words: list[tuple[bytes, int]]  # body words with style flags
    title_words: list[bytes]
    title_chunk: bytes
    links: list[tuple[bytes, list[bytes]]]  # (url, anchor words)
    base: bytes
    english: bool


class _Parser:
    __slots__ = (
        "d", "L", "words", "title_words", "links", "base", "english",
        "in_title", "in_anchor", "in_discard", "in_heading", "in_bold",
        "tag_discarding", "current_link",
    )

    def __init__(self, data: bytes):
        self.d = data.lower()  # stringToLower, HtmlParser.cpp:23-30,311
        self.L = len(self.d)
        self.words: list[tuple[bytes, int]] = []
        self.title_words: list[bytes] = []
        self.links: list[tuple[bytes, list[bytes]]] = []
        self.base = b""
        self.english = True
        self.in_title = False
        self.in_anchor = False
        self.in_discard = False
        self.in_heading = False
        self.in_bold = False
        self.tag_discarding = b""
        self.current_link = b""

    def _at(self, i: int) -> int:
        # virtual NUL terminator past the end, as the reference relies on
        return self.d[i] if 0 <= i < self.L else 0

    # --- ParseText: HtmlParser.cpp:243-277 ---------------------------------
    def _emit_word(self, word: bytes) -> None:
        if self.in_anchor and self.current_link:
            self.links[-1][1].append(word)
        if self.in_title:
            self.title_words.append(word)
        else:
            self.words.append((word, _flags(self.in_bold, self.in_heading)))

    def parse_text(self, i: int) -> int:
        d, L = self.d, self.L
        start = i
        while i < L and d[i] != 0x3C:  # '<'
            if d[i] in _WS:
                if start != i:
                    self._emit_word(d[start:i])
                i += 1
                while i < L and d[i] in _WS:
                    i += 1
                start = i
            else:
                i += 1
        if start != i:
            self._emit_word(d[start:i])
        return i

    # --- ParseTag: HtmlParser.cpp:68-241 ------------------------------------
    def parse_tag(self, i: int):
        d, L = self.d, self.L
        i += 1
        while i < L and d[i] in _WS:
            i += 1
        start = i
        while i < L and d[i] not in _WS and d[i] != 0x3E:  # '>'
            i += 1
        tag_name = d[start:i]
        is_closing = tag_name.startswith(b"/")
        if is_closing:
            tag_name = tag_name[1:]
        if tag_name.endswith(b"/"):
            tag_name = tag_name[:-1]

        action = lookup_tag(tag_name)

        # style state set BEFORE the closing-tag early return (cpp:89-103)
        if tag_name == b"b":
            self.in_bold = True
        elif tag_name in _HEADINGS:
            self.in_heading = True

        if is_closing and action != ORDINARY:
            while i < L and d[i] != 0x3E:
                i += 1
            if self._at(i) == 0x3E:
                i += 1
            return i

        if action == DISCARD_SECTION:
            self.tag_discarding = tag_name
            self.in_discard = True
        elif action == COMMENT:
            while i < L and not (
                self._at(i) == 0x2D and self._at(i + 1) == 0x2D and self._at(i + 2) == 0x3E
            ):
                i += 1
            if i < L:
                i += 3
            return i
        elif action == TITLE:
            self.in_title = True
        elif action == ANCHOR:
            tag_end = i
            in_quotes = False
            while tag_end < L:
                c = d[tag_end]
                if c == 0x22:  # '"'
                    in_quotes = not in_quotes
                elif c == 0x3E and not in_quotes:
                    break
                tag_end += 1
            if self._at(tag_end) == 0x3E:
                href_pos = self._find_href(i, tag_end)
                if href_pos is not None:
                    end_quote = d.find(b'"', href_pos)
                    if end_quote != -1 and end_quote < tag_end:
                        href = d[href_pos:end_quote]
                        if href:
                            self.links.append((href, []))
                            self.current_link = href
                            self.in_anchor = True
            i = tag_end
        elif action == BASE:
            if not self.base:
                end = d.find(b">", i)
                if end != -1:
                    e = end
                    if e > 0 and d[e - 1] == 0x2F:  # trailing '/'
                        e -= 1
                    self.base = _extract_attribute(d[i:e], b"href")
                # no '>' is UB in the reference; we read to EOF as empty
        elif action == EMBED:
            end = d.find(b">", i)
            if end == -1:
                return None  # ptr = nullptr → parse ends (cpp:158-160)
            src = _extract_attribute(d[i:end], b"src")
            if src:
                self.links.append((src, []))
        elif action == ORDINARY:
            return self._handle_ordinary(i, start)
        elif action == HTML_TAG:
            # scan inside the tag for lang="xx (cpp:223-236)
            while i < L and d[i] != 0x3E:
                if d[i : i + 6] == b'lang="':
                    self.english = (
                        self._at(i + 6) == 0x65 and self._at(i + 7) == 0x6E
                    )  # 'e','n'
                    i += 8
                    break
                i += 1

        while i < L and d[i] != 0x3E:
            i += 1
        if self._at(i) == 0x3E:
            i += 1
        return i

    def _find_href(self, i: int, tag_end: int):
        # FindHrefAttribute, cpp:57-66
        d = self.d
        j = d.find(b"h", i)
        while j != -1 and j < tag_end:
            if d[j : j + 6] == b'href="':
                return j + 6
            j = d.find(b"h", j + 1)
        return None

    def _handle_ordinary(self, i: int, start: int):
        # broken-HTML salvage, cpp:166-222
        d, L = self.d, self.L
        tag_start = start - 1
        next_lt = d.find(b"<", i)
        next_gt = d.find(b">", i)

        if next_gt == -1 or (next_lt != -1 and next_lt < next_gt):
            # unclosed tag: maybe merge with the preceding word
            bound = 2 * i - L  # ptr - strlen(ptr), cpp:179
            lb = tag_start - 1
            while lb >= bound and lb >= 0 and d[lb] not in _WS and d[lb] != 0x3C:
                lb -= 1
            lb += 1
            if self.words and lb < tag_start:
                combined = d[lb:i]
                self.words.pop()
            else:
                combined = d[tag_start:i]
            if self.in_anchor and self.current_link:
                if self.links[-1][1]:
                    self.links[-1][1].pop()
                self.links[-1][1].append(combined)
            if self.in_title:
                self.title_words.append(combined)
            else:
                self.words.append((combined, _flags(self.in_bold, self.in_heading)))
            return self.parse_text(i)
        else:
            # tag text up to '>' re-emitted as words (NOT into anchor text)
            unrecognized = d[tag_start : next_gt + 1]
            for word in unrecognized.split():
                if self.in_title:
                    self.title_words.append(word)
                else:
                    self.words.append((word, _flags(self.in_bold, self.in_heading)))
            return next_gt + 1

    # --- main loop: HtmlParser.cpp:309-368 ----------------------------------
    def run(self) -> ParseResult:
        d, L = self.d, self.L
        i = 0
        while i is not None and 0 <= i < L:
            if d[i] == 0x3C:  # '<'
                nxt = self._at(i + 1)
                if nxt == 0x2F and self.in_title and d[i + 2 : i + 7] == b"title":
                    self.in_title = False
                    i = self._skip_past_gt(i)
                elif nxt == 0x2F and self.in_anchor and self._at(i + 2) == 0x61:  # 'a'
                    self.in_anchor = False
                    i = self._skip_past_gt(i)
                elif (
                    nxt == 0x2F
                    and self.in_heading
                    and self._at(i + 2) == 0x68  # 'h'
                    and 0x31 <= self._at(i + 3) <= 0x36
                ):
                    self.in_heading = False
                    i = self._skip_past_gt(i)
                elif nxt == 0x2F and self.in_bold and self._at(i + 2) == 0x62:  # 'b'
                    self.in_bold = False
                    i = self._skip_past_gt(i)
                elif self.in_discard:
                    i = self._find_first_closing_tag(i)
                    if i is None:
                        break
                    self.in_discard = False
                else:
                    i = self.parse_tag(i)
            else:
                if not self.in_discard:
                    i = self.parse_text(i)
                else:
                    i += 1

        title_chunk = b" ".join(self.title_words)  # cpp:370-376
        return ParseResult(
            self.words, self.title_words, title_chunk,
            self.links, self.base, self.english,
        )

    def _skip_past_gt(self, i: int):
        j = self.d.find(b">", i)
        return None if j == -1 else j + 1

    def _find_first_closing_tag(self, i: int):
        # FindFirstClosingTag, cpp:279-307
        d = self.d
        j = d.find(b"<", i)
        while j != -1:
            if d[j : j + 9] == b"</script>" and self.tag_discarding == b"script":
                return j + 9
            if d[j : j + 8] == b"</style>" and self.tag_discarding == b"style":
                return j + 8
            if d[j : j + 6] == b"</svg>" and self.tag_discarding == b"svg":
                return j + 6
            j = d.find(b"<", j + 1)
        return None


def parse_html(data: bytes) -> ParseResult:
    """Parse one HTML byte buffer with the reference's exact semantics."""
    return _Parser(data).run()


def extracted_text(result: ParseResult) -> bytes:
    """The engine's 'extracted text' for the byte-identity invariant:
    space-joined body words in document order (the reference's words_flags
    sequence, HtmlParser.h:92)."""
    return b" ".join(w for w, _ in result.words)
