"""Reference dynamic span-feature ranker (SURVEY.md §2.7 R4/R5) —
"heuristic parity" dynamic scoring next to BM25 (the north-rule scorer).

Semantics ported rule-for-rule from Ranker.cpp with the constants of
Ranker.hpp:83-114:

* ``find_best_span``      — FindBestSpan (Ranker.cpp:17-77): around each
  occurrence of the doc's RAREST query term, look for every other term
  within ±CLOSE_THRESHOLD of its expected relative position; the span
  flags (exact / ordered / close / bold-heading) and termCount feed the
  counters.  The reference RESETS the exact/ordered/close flags at the
  top of each other-term iteration (Ranker.cpp:45-47), so the final
  flags reflect the LAST other term's window — ported as-is.
* ``extract_dynamic_features`` — ExtractDynamicFeatures
  (Ranker.cpp:157-265): per-term tfs, url substring match (keys keep
  their '@' decoration exactly like ISRWord::GetKey, so title terms can
  never url-match — reference behavior), rarest-term selection (first
  minimum of the positive frequencies), and the per-occurrence span
  counter loop.
* ``calculate_dynamic_score`` — CalculateDynamicScore
  (Ranker.cpp:335-399): weighted span quality (sigmoid span/bold boosts
  for body), top-position score, frequency-tier score, 0.5/0.3/0.2 mix,
  ×1.2 title url-match boost.
* ``rank_doc``            — the WorkerThread per-doc flow
  (Ranker.cpp:451-517): overlong-title rejection, static threshold,
  title/body dynamic mix 0.7/0.3, synonym fallback when dynamic < 0.1
  (0.4·syn + 0.6·origin, Ranker.cpp:505-516), final 0.75·dynamic +
  0.25·static.

Documented divergences from the C++ (all artifacts of its GLOBAL
location axis; this engine's positions are per-doc 0-based):
* the seek window clamps at 0 instead of underflowing an unsigned
  subtraction when expected < CLOSE_THRESHOLD (Ranker.cpp:43 would wrap
  and find nothing — unreachable in the reference because global
  locations are never < 10);
* TOP_POSITION_THRESHOLD is doc-relative ("rarest term within the first
  100 positions of THIS doc"), which is the evident intent — globally it
  would credit only the first document of the whole index;
* the candidate supply is the full matching set ranked (score DESC,
  doc_id ASC) — no MAX_DOCS=100 mutex-ordered cap (nondeterministic
  thread interleaving in the reference, Ranker.cpp:533-538);
* synonym expansion order is the deterministic query_ast order, not the
  reference's hash-map+stack order (affects expected-position vectors
  only between synonyms of one OrSyn).
"""

from __future__ import annotations

from bisect import bisect_left
from dataclasses import dataclass, field

from search_engine_spark.plans.static_score import custom_exp_py

# Ranker.hpp:83-114
CLOSE_THRESHOLD = 10
TOP_POSITION_THRESHOLD = 100
MOST_WORDS_RATIO = 0.7
SHORT_SPAN_WEIGHT = 0.04
SHORTEST_SPAN_WEIGHT = 0.08
CLOSE_SPAN_WEIGHT = 0.23
ORDERED_SPAN_WEIGHT = 0.10
EXACT_PHRASE_WEIGHT = 0.55
TOP_POSITION_WEIGHT = 1.0
ALL_FREQUENT_WEIGHT = 0.57
MOST_FREQUENT_WEIGHT = 0.29
SOME_FREQUENT_WEIGHT = 0.14
TITLE_WEIGHT = 0.7
BODY_WEIGHT = 0.3
DYNAMIC_THRESHOLD = 0.1
SYN_WEIGHT = 0.4       # Ranker.hpp:110 (synonym fallback mix)
ORIGIN_WEIGHT = 0.6
URL_TERM_MATCH_BOOST = 1.2
FREQUENT_THRESHOLD = 0.01
OPTIMAL_TITLE_LENGTH = 10.0

_BOLD = 1      # Posts.hpp:33 bit 0
_HEADING = 2   # Posts.hpp:33 bit 1


@dataclass
class Span:
    term_count: int = 1
    is_exact_phrase: bool = True
    is_ordered: bool = True
    is_close: bool = True
    is_bold_heading: bool = False


@dataclass
class DynFeatures:
    exact_phrase_count: int = 0
    ordered_count: int = 0
    close_count: int = 0
    double_count: int = 0
    triple_count: int = 0
    bold_heading_count: int = 0
    top_position_spans: int = 0
    term_frequencies: list[int] = field(default_factory=list)
    has_url_match: bool = False


def find_best_span(
    others: list[tuple[list[int], list[int]]],
    expected_rel: list[int],
    target_pos: int,
    doc_end: int,
) -> Span:
    """FindBestSpan (Ranker.cpp:17-77).  ``others[i]`` is the i-th other
    term's (sorted positions, aligned flags); ``expected_rel[i]`` its
    query-relative offset from the rarest term."""
    span = Span()
    prev_location = 0
    for (positions, flags), rel in zip(others, expected_rel):
        if rel == 1:
            prev_location = target_pos
        expected = target_pos + rel
        span.is_exact_phrase = False
        span.is_ordered = False
        span.is_close = False
        i = bisect_left(positions, max(0, expected - CLOSE_THRESHOLD))
        while (
            i < len(positions)
            and positions[i] <= expected + CLOSE_THRESHOLD
            and positions[i] <= doc_end
        ):
            pos = positions[i]
            dist = pos - expected
            if flags[i] & (_BOLD | _HEADING):
                span.is_bold_heading = True
            if pos > prev_location:
                span.is_ordered = True
                prev_location = pos
            if dist == 0:
                span.is_exact_phrase = True
            if abs(dist) <= CLOSE_THRESHOLD and not span.is_close:
                span.term_count += 1
                span.is_close = True
            i += 1
    return span


def extract_dynamic_features(
    keys: list[str],
    pos_map: dict[str, list[int]],
    flag_map: dict[str, list[int]],
    doc_end: int,
    url: str | None = None,
) -> DynFeatures:
    """ExtractDynamicFeatures (Ranker.cpp:157-265) for ONE term group
    (title or body, original or synonym) of ONE document."""
    f = DynFeatures()
    if not keys:
        return f
    f.term_frequencies = [len(pos_map.get(k, ())) for k in keys]
    url_l = url.lower() if url else ""
    if url_l:
        for k in keys:
            if k.lower() in url_l:
                f.has_url_match = True
                break

    rarest_idx = -1
    min_freq = None
    for i, tf in enumerate(f.term_frequencies):
        if tf > 0 and (min_freq is None or tf < min_freq):
            min_freq = tf
            rarest_idx = i
    if rarest_idx < 0:
        return f

    others = []
    expected_rel = []
    for i, k in enumerate(keys):
        if i != rarest_idx:
            others.append((pos_map.get(k, []), flag_map.get(k, [])))
            expected_rel.append(i - rarest_idx)

    rarest_pos = pos_map[keys[rarest_idx]]
    rarest_flags = flag_map.get(keys[rarest_idx], [0] * len(rarest_pos))
    for pos, flag in zip(rarest_pos, rarest_flags):
        span = find_best_span(others, expected_rel, pos, doc_end)
        if span.is_bold_heading or flag & (_BOLD | _HEADING):
            f.bold_heading_count += 1
        if span.is_exact_phrase:
            f.exact_phrase_count += 1
        elif span.is_ordered:
            f.ordered_count += 1
        elif span.is_close:
            f.close_count += 1
        if span.term_count == 2:
            f.double_count += 1
        elif span.term_count >= 3 or len(keys) == 1:
            f.triple_count += 1
        if pos <= TOP_POSITION_THRESHOLD:
            f.top_position_spans += 1
    return f


def calculate_dynamic_score(f: DynFeatures, is_title: bool,
                            doc_length: int) -> float:
    """CalculateDynamicScore (Ranker.cpp:335-399)."""
    total = (f.exact_phrase_count + f.ordered_count + f.close_count
             + f.double_count + f.triple_count)
    span_score = (
        f.exact_phrase_count * EXACT_PHRASE_WEIGHT
        + f.ordered_count * ORDERED_SPAN_WEIGHT
        + f.close_count * CLOSE_SPAN_WEIGHT
        + f.double_count * SHORTEST_SPAN_WEIGHT
        + f.triple_count * SHORT_SPAN_WEIGHT
    )
    if total > 0:
        span_score /= total
        if not is_title:
            span_boost = 0.3 + 0.7 / (1.0 + custom_exp_py(-1.2 * (total - 4)))
            bold_boost = 0.7 + 0.3 / (
                1.0 + custom_exp_py(-4.0 * (float(f.bold_heading_count) - 1.0))
            )
            span_score *= span_boost * bold_boost

    position_score = f.top_position_spans * TOP_POSITION_WEIGHT

    freq_score = 0.0
    if f.term_frequencies:
        frequent = 0
        for tf in f.term_frequencies:
            rel = (tf / doc_length) if doc_length > 0 else 0.0
            if rel >= FREQUENT_THRESHOLD:
                frequent += 1
        n = len(f.term_frequencies)
        if frequent == n:
            freq_score = ALL_FREQUENT_WEIGHT
        elif frequent >= n * MOST_WORDS_RATIO:
            freq_score = MOST_FREQUENT_WEIGHT
        elif frequent > 0:
            freq_score = SOME_FREQUENT_WEIGHT

    base = span_score * 0.5 + position_score * 0.3 + freq_score * 0.2
    if f.has_url_match and is_title:
        base *= URL_TERM_MATCH_BOOST
    return base


@dataclass
class TermGroups:
    """The four separateISRs groups (Ranker.cpp:418-437), in flatten
    (left-to-right leaf, first-occurrence-dedup) order."""
    title: list[str]
    body: list[str]
    title_syn: list[str]
    body_syn: list[str]

    def all_keys(self) -> list[str]:
        return self.title + self.body + self.title_syn + self.body_syn


def rank_doc(
    groups: TermGroups,
    pos_map: dict[str, list[int]],
    flag_map: dict[str, list[int]],
    url: str,
    title_len: int,
    word_count: int,
    dl: int,
    static_score: float,
) -> float | None:
    """WorkerThread per-doc scoring flow (Ranker.cpp:478-517); returns the
    final mixed score, or None when a threshold rejects the doc."""
    from search_engine_spark.plans.static_score import STATIC_THRESHOLD

    if title_len > OPTIMAL_TITLE_LENGTH * 4:   # Ranker.cpp:486-488
        return None
    if static_score < STATIC_THRESHOLD:        # Ranker.cpp:491-493
        return None
    doc_end = dl - 1

    def dyn(title_keys: list[str], body_keys: list[str]) -> float:
        tf_ = extract_dynamic_features(title_keys, pos_map, flag_map,
                                       doc_end, url)
        bf_ = extract_dynamic_features(body_keys, pos_map, flag_map, doc_end)
        t = calculate_dynamic_score(tf_, True, title_len)
        b = calculate_dynamic_score(bf_, False, word_count - title_len)
        return TITLE_WEIGHT * t + BODY_WEIGHT * b

    dynamic = dyn(groups.title, groups.body)
    if dynamic < DYNAMIC_THRESHOLD:            # synonym fallback
        syn = dyn(groups.title_syn, groups.body_syn)
        dynamic = syn * SYN_WEIGHT + dynamic * ORIGIN_WEIGHT
        if dynamic < DYNAMIC_THRESHOLD:
            return None
    return dynamic * 0.75 + static_score * 0.25   # Ranker.cpp:517


def term_groups_from_ast(ast) -> TermGroups:
    """ISR_Tree::getFlattenedTerms + separateISRs: left-to-right DFS over
    the compiled AST's word leaves, '@'-decorated twin first (the
    reference's generate_decorated puts the title ISR left of the body
    ISR, query.cpp:902-904), dedup by key keeping first occurrence
    (ISRWord::collectTerms, Indexer.hpp:621-628), synonym subtrees
    marked (ISRSynOr::collectTerms, isr.cpp:244-262)."""
    from search_engine_spark.plans.query_ast import (
        And, Not, Or, OrSyn, Phrase, Word,
    )

    ordered: list[tuple[str, bool]] = []   # (key, is_syn)
    seen: set[str] = set()

    def add(key: str, syn: bool) -> None:
        if key not in seen:
            seen.add(key)
            ordered.append((key, syn))

    def walk(e, syn: bool) -> None:
        if e is None:
            return
        if isinstance(e, Word):
            add("@" + e.stem, syn)
            add(e.stem, syn)
        elif isinstance(e, Phrase):
            for s in e.effective_stems:
                add("@" + s, syn)
                add(s, syn)
        elif isinstance(e, (And, Or)):
            walk(e.left, syn)
            walk(e.right, syn)
        elif isinstance(e, Not):
            walk(e.child, syn)
        elif isinstance(e, OrSyn):
            walk(e.original, syn)
            for s in e.synonyms:
                walk(s, True)
        else:
            raise TypeError(type(e))

    walk(ast, False)
    return TermGroups(
        title=[k for k, s in ordered if k.startswith("@") and not s],
        body=[k for k, s in ordered if not k.startswith("@") and not s],
        title_syn=[k for k, s in ordered if k.startswith("@") and s],
        body_syn=[k for k, s in ordered if not k.startswith("@") and s],
    )
