"""BM25 scoring (north-rule scorer; replaces the reference's heuristic
ranker R2-R7 as documented in SURVEY.md §2.7).

idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)        (Robertson-Sparck Jones+1)
w(tf,dl)= tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
score   = sum over query terms of idf * w

k1=1.2, b=0.75 (FIXTURES.md §5).  Title-decorated '@' terms and body terms
are independent scoring terms with their own df — a word leaf's score is
the sum of both (its match set is the union).  Synonyms contribute with
weight 0.4 (Ranker.hpp:110 SYN_WEIGHT).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _as_col(x) -> Column:
    """Accept a Python scalar or a Column (so corpus stats can be a 1-row
    broadcast side plan instead of a driver collect)."""
    return x if isinstance(x, Column) else F.lit(float(x))


def idf_col(df_col: Column, n_docs) -> Column:
    return F.log((_as_col(n_docs) - df_col + 0.5) / (df_col + 0.5) + 1.0)


def weight_col(tf_col: Column, dl_col: Column, avgdl,
               k1: float = K1, b: float = B) -> Column:
    return (tf_col * (k1 + 1.0)) / (
        tf_col + k1 * (1.0 - b + b * dl_col / _as_col(avgdl))
    )


def idf(df: int, n_docs: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def weight(tf: float, dl: float, avgdl: float, k1: float = K1, b: float = B) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
