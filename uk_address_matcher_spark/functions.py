"""String-similarity functions beyond Spark's built-ins.

Jaro-Winkler is named by the north star as a fuzzy comparator; Spark has
levenshtein natively (the only fuzzy function the reference itself uses —
splink_model.json:667) but no Jaro-Winkler, so it is provided as an
Arrow-batched pandas UDF (pure-python inner loop over short strings; the
batch boundary is Arrow, never per-row Python in the executor protocol).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler_py(
    s1: str | None, s2: str | None, p: float = 0.1, boost_threshold: float = 0.7
) -> float | None:
    """Standard Winkler definition: the prefix boost applies only when the
    Jaro similarity exceeds ``boost_threshold`` (0.7) — same semantics as
    DuckDB's jaro_winkler_similarity (verified digit-for-digit)."""
    if s1 is None or s2 is None:
        return None
    j = _jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def jaro_winkler_col(a: Column, b: Column) -> Column:
    return jaro_winkler(a, b)
