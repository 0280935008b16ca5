"""Text analysis for large-scale training-data pipelines.

Everything here is dialect-shared with ANSI SQL (verified against DuckDB)
so the driver's oracle can replay each operator: normalisation avoids
lookarounds, hashing is md5-hex based (identical in both engines), and
arithmetic stays in BIGINT/DOUBLE.

All operators are single-projection (no shuffle) except the TF-style
aggregations, and scale linearly: at 100 TB these run as a map-only scan
with column pruning (only `text` is read from parquet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ["THE", "A", "AND", "OF", "TO", "IN", "IS", "ON", "FOR", "WITH"]

# tiny per-language marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["THE", "AND", "OF", "IS", "WITH"],
    "fr": ["LE", "LA", "LES", "ET", "DES"],
    "de": ["DER", "DIE", "DAS", "UND", "MIT"],
    "es": ["EL", "LOS", "LAS", "QUE", "CON"],
}


def normalize_text(c: Column) -> Column:
    """Uppercase, non-alphanumerics to spaces, collapsed, trimmed."""
    c = F.upper(c)
    c = F.regexp_replace(c, r"[^A-Z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def tokens(c: Column) -> Column:
    return F.filter(F.split(normalize_text(c), " "), lambda t: t != "")


def token_count(c: Column) -> Column:
    """Whitespace token count plus a BPE-ish estimate (words longer than 6
    chars count one extra subword per 4 chars)."""
    t = tokens(c)
    whitespace = F.size(t)
    extra = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.when(F.length(w) > 6, ((F.length(w) - 3) / 4).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
    )
    return (whitespace + extra).alias("token_count")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + a combined score."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(F.size(toks), F.lit(1)), 6)
    digit_ratio = F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6)
    score = F.round(
        F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.2,
        6,
    )
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: argmax over marker-hit counts,
    'und' (undetermined) when nothing hits."""
    toks = tokens(F.col(text_col))

    def hits(lang: str) -> Column:
        lit = F.array(*[F.lit(s) for s in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))

    langs = list(LANG_MARKERS)
    scores = F.array(
        *[
            F.struct(hits(lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in langs
        ]
    )
    # max by (hits, lang) — deterministic tie-break on language code
    best = F.array_sort(scores)[len(langs) - 1]
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_guess"
        ),
        best["hits"].alias("marker_hits"),
    )


def md5_int(c: Column) -> Column:
    """First 8 hex digits of md5 as BIGINT — identical in Spark
    (conv(...,16,10)) and DuckDB (('0x'||...)::BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    md5-hashed normalized tokens, mod 2^31-1."""
    toks = tokens(F.col(text_col))
    MOD = 2147483647
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + md5_int(t) % MOD) % MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def token_rel_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token relative frequencies (explode -> count -> share)."""
    t = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = t.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token", "cnt", F.round(F.col("cnt") / F.col("total"), 10).alias("rel_freq")
    )
