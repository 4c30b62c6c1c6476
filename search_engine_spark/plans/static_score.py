"""Reference static page-quality score (SURVEY.md §2.7 R2/R3), as pure
column expressions over docmeta — the optional "heuristic parity" scoring
surface next to BM25 (the north-rule scorer).

Semantics ported rule-for-rule from Ranker::CalculateStaticScore
(Ranker.cpp:299-333) with the constants of Ranker.hpp:83-114:

  static = 0.35·custom_exp(−0.02·url_len)          url-length score
         + 0.35·tld_weight                          GetTLDScore table
         + 0.15·docLenScore                         1/(1+(wc−600)²/250000)
         + 0.15·custom_exp(−0.08·max(title_len−10, 0))
  ×0.14 if not english (NON_ENGLISH_WEIGHT)
  ×0.15 if utility page and not a utility query (UTILITY_PAGE_PENALTY)

``custom_exp`` is the reference's 7-term Taylor approximation
(lib/algorithm.h:116-133) — NOT libm exp; ported exactly (clamps at ±20,
symmetry via reciprocal, Horner form).  In heuristic-parity mode the final
score is 0.75·bm25 + 0.25·static with static<0.25 candidates pruned
(STATIC_THRESHOLD, Ranker.cpp:491-493).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.schemas import TLD_CODE

# GetTLDScore (Ranker.cpp:267-297), keyed by the reference enum code
TLD_WEIGHTS = {
    "unknown": 0.05, "gov": 1.0, "edu": 0.95, "org": 0.9, "com": 0.75,
    "net": 0.7, "io": 0.6, "info": 0.4, "biz": 0.3, "xyz": 0.2,
    "top": 0.1, "us": 0.7, "dev": 0.6,
}

UTILITY_URL_PATTERNS = ["privacy", "terms", "404", "error", "policy", "legal"]
UTILITY_QUERY_TERMS = ["privacy", "terms", "policy", "legal", "contact",
                       "about", "cookies"]

NON_ENGLISH_WEIGHT = 0.14
UTILITY_PAGE_PENALTY = 0.15
STATIC_THRESHOLD = 0.25
STATIC_MIX = 0.25   # final = 0.75*dynamic + 0.25*static (Ranker.cpp:517)


def custom_exp_py(x: float) -> float:
    """Python mirror of lib/algorithm.h custom_exp (tests + oracle)."""
    if x > 20.0:
        return 4.85e8
    if x < -20.0:
        return 2.06e-9
    neg = x < 0
    if neg:
        x = -x
    r = 1.0 + x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (1.0 / 24.0
        + x * (1.0 / 120.0 + x * (1.0 / 720.0))))))
    return 1.0 / r if neg else r


def custom_exp_col(x: Column) -> Column:
    ax = F.abs(x)
    horner = (
        F.lit(1.0) + ax * (F.lit(1.0) + ax * (F.lit(0.5) + ax * (
            F.lit(1.0 / 6.0) + ax * (F.lit(1.0 / 24.0) + ax * (
                F.lit(1.0 / 120.0) + ax * F.lit(1.0 / 720.0))))))
    )
    val = F.when(x < 0, F.lit(1.0) / horner).otherwise(horner)
    return (
        F.when(x > 20.0, F.lit(4.85e8))
        .when(x < -20.0, F.lit(2.06e-9))
        .otherwise(val)
    )


def tld_weight_col(tld_code: Column) -> Column:
    expr = F.lit(TLD_WEIGHTS["unknown"])
    for name, code in TLD_CODE.items():
        if name != "unknown":
            expr = F.when(tld_code == code, F.lit(TLD_WEIGHTS[name])).otherwise(expr)
    return expr


def is_utility_page_col(url: Column) -> Column:
    low = F.lower(url)
    cond = F.lit(False)
    for p in UTILITY_URL_PATTERNS:
        cond = cond | low.contains(p)
    return cond


def is_utility_query(stems: list[str]) -> bool:
    """AnalyzeQueryIntent (Ranker.cpp:126-155): utility intent iff any
    MODIFIER (terms after the first) is a utility term."""
    return any(s in UTILITY_QUERY_TERMS for s in stems[1:])


def static_score_col(utility_query: bool = False) -> Column:
    """Static score over docmeta columns (url, url_len, word_count,
    title_len, english, tld)."""
    url_score = custom_exp_col(F.lit(-0.02) * F.col("url_len"))
    tld_score = tld_weight_col(F.col("tld"))
    diff = F.col("word_count") - F.lit(600.0)
    doclen_score = F.lit(1.0) / (F.lit(1.0) + diff * diff / F.lit(250000.0))
    tdiff = F.greatest(F.col("title_len") - F.lit(10.0), F.lit(0.0))
    title_score = custom_exp_col(F.lit(-0.08) * tdiff)
    base = (
        url_score * 0.35 + tld_score * 0.35
        + doclen_score * 0.15 + title_score * 0.15
    )
    base = F.when(~F.col("english"), base * NON_ENGLISH_WEIGHT).otherwise(base)
    if not utility_query:
        base = F.when(
            is_utility_page_col(F.col("url")), base * UTILITY_PAGE_PENALTY
        ).otherwise(base)
    return base


def static_score_py(row: dict, utility_query: bool = False) -> float:
    """Row-level mirror for the pytest oracle."""
    base = (
        0.35 * custom_exp_py(-0.02 * row["url_len"])
        + 0.35 * TLD_WEIGHTS[
            {v: k for k, v in TLD_CODE.items()}[row["tld"]]
        ]
        + 0.15 * (1.0 / (1.0 + (row["word_count"] - 600.0) ** 2 / 250000.0))
        + 0.15 * custom_exp_py(-0.08 * max(row["title_len"] - 10.0, 0.0))
    )
    if not row["english"]:
        base *= NON_ENGLISH_WEIGHT
    if not utility_query and any(
        p in row["url"].lower() for p in UTILITY_URL_PATTERNS
    ):
        base *= UTILITY_PAGE_PENALTY
    return base
