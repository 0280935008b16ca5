"""Address-cleaning steps as pure DataFrame -> DataFrame transformations.

Each step re-expresses one cleaning stage of the reference pipeline
(/root/reference/uk_address_matcher/cleaning/cleaning_steps.py and
regexes.py) as Catalyst expressions — no Python UDFs in the hot path.
The whole queue fuses into a handful of whole-stage-codegen projections.
Heavy expression trees are emitted as SQL text (one F.expr parse) rather
than composed through the Column API, which costs a Py4J round-trip per
operator node — see the sqlexpr module doc; the parsed trees are
identical.

Dialect notes (verified empirically against DuckDB 1.0):
 - DuckDB's RE2 silently NO-OPS on lookbehind and backreference patterns,
   so the reference's `standarise_num_dash_num` (regexes.py:16-39) and
   `remove_repeated_tokens` (regexes.py:48-71) never fire there. Java
   regex supports both, so here they implement the reference's DOCUMENTED
   intent (the docstring examples) — a deliberate, noted divergence.
 - DuckDB `arr[:-2]` keeps all but the LAST element; `arr[:-3]` drops two.
 - `list_aggregate([], 'histogram')` is NULL, not an empty map.
 - Spark 4 runs ANSI mode: use try_element_at / guarded slice everywhere
   DuckDB would return NULL out-of-bounds.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed at module scope for pandas-UDF type hints

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uk_address_matcher_spark import sqlexpr as X


def let(value: Column, body) -> Column:
    """Bind ``value`` once and use it many times inside ``body``.

    Spark has no let-expression; substituting a Python Column variable N
    times duplicates the expression tree N times (filter pushdown and
    project collapse inline aliases freely), which blows up codegen for
    heavy expressions like the 9-regex cleaning chain. `transform` over a
    single-element array gives a real lambda binding: the value is
    evaluated once per row and the lambda variable is a cheap reference.
    """
    return F.try_element_at(F.transform(F.array(value), body), F.lit(1))


def pin(value: Column, seed: int) -> Column:
    """Identity wrapper that stops Catalyst re-evaluating ``value`` once
    per consumer.

    ``let`` binds within ONE expression; across expressions, CollapseProject
    and PushDownPredicate inline a column's defining expression into every
    consumer — including into HOF lambdas, where it then re-evaluates per
    element. Embedding a seeded ``rand`` (value-neutral: the index is
    always 1) flags the expression nondeterministic, which those rules
    refuse to touch, so the column materialises once per row and consumers
    reference it. Works for any column type, including maps and arrays.
    Use only on expensive multi-consumer columns: it also blocks filter
    pushdown through the projection.
    """
    idx = (F.lit(1.0) + F.lit(0.0) * F.rand(seed)).cast("int")
    return F.try_element_at(F.array(value), idx)


# ---------------------------------------------------------------------------
# String-level regex battery (reference: cleaning/regexes.py).
# Each helper has a Column form (unit-testable, composable) and an
# `*_sql` string form; the step functions emit SQL text because building
# these trees through Py4J costs milliseconds PER OPERATOR (sqlexpr
# module doc) and the cleaning queue is rebuilt per linkage call.
# ---------------------------------------------------------------------------


def _rr(c: str, pattern: str, replacement: str) -> str:
    return f"regexp_replace({c}, {X.q(pattern)}, {X.q(replacement)})"


def remove_commas_periods(c: Column) -> Column:
    return F.regexp_replace(c, r"[,.]", " ")


def remove_commas_periods_sql(c: str) -> str:
    return _rr(c, r"[,.]", " ")


def remove_apostrophes(c: Column) -> Column:
    return F.regexp_replace(c, r"'", "")


def remove_apostrophes_sql(c: str) -> str:
    return _rr(c, r"'", "")


def remove_multiple_spaces(c: Column) -> Column:
    return F.regexp_replace(c, r"\s+", " ")


def remove_multiple_spaces_sql(c: str) -> str:
    return _rr(c, r"\s+", " ")


def replace_fwd_slash_with_dash(c: Column) -> Column:
    return F.regexp_replace(c, r"/", "-")


def replace_fwd_slash_with_dash_sql(c: str) -> str:
    return _rr(c, r"/", "-")


NUM_DASH_NUM_RE = r"(?<![A-Za-z])(\d+[A-Za-z]?)\s*-\s*(\d+[A-Za-z]?)(?![A-Za-z])"


def standarise_num_dash_num(c: Column) -> Column:
    # '23A - 24' -> '23A-24' (regexes.py:16-39; intent active here, see module doc)
    return F.regexp_replace(c, NUM_DASH_NUM_RE, r"$1-$2")


def standarise_num_dash_num_sql(c: str) -> str:
    return _rr(c, NUM_DASH_NUM_RE, r"$1-$2")


def separate_letter_num(c: Column) -> Column:
    # 'C230' -> 'C 230' (regexes.py:106-129)
    return F.regexp_replace(c, r"\b([A-Za-z])\s*(\d+)\b", r"$1 $2")


def separate_letter_num_sql(c: str) -> str:
    return _rr(c, r"\b([A-Za-z])\s*(\d+)\b", r"$1 $2")


def standarise_num_letter(c: Column) -> Column:
    # '123-A ' -> '123A ' (regexes.py:78-103; [[:punct:]] -> \p{Punct})
    return F.regexp_replace(c, r"(\d{1,4})[\p{Punct}\s]([A-Za-z])\s", r"$1$2 ")


def standarise_num_letter_sql(c: str) -> str:
    return _rr(c, r"(\d{1,4})[\p{Punct}\s]([A-Za-z])\s", r"$1$2 ")


def move_flat_to_front(c: Column) -> Column:
    # regexes.py:132-153 — despite its name this only rewrites the matched
    # suffix in place ('\1 \2'), normalising whitespace after 'FLAT n'
    return F.regexp_replace(c, r"\b(FLAT \d+[A-Z]?)\s+(.*)", r"$1 $2")


def move_flat_to_front_sql(c: str) -> str:
    return _rr(c, r"\b(FLAT \d+[A-Z]?)\s+(.*)", r"$1 $2")


def remove_repeated_tokens(c: Column) -> Column:
    # 'word word' -> 'word' (regexes.py:48-71; intent active here)
    return F.regexp_replace(c, r"\b(\w{4,})\s+\1\b", r"$1")


def remove_repeated_tokens_sql(c: str) -> str:
    return _rr(c, r"\b(\w{4,})\s+\1\b", r"$1")


UK_POSTCODE_REGEX = r"^([A-Z]{1,2}\d[A-Z\d]?|GIR)\s*(\d[A-Z]{2})$"


# ---------------------------------------------------------------------------
# Step functions (reference: cleaning/cleaning_steps.py)
# ---------------------------------------------------------------------------


def trim_whitespace_address_and_postcode(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:47-58
    return df.withColumn("address_concat", F.trim("address_concat")).withColumn(
        "postcode", F.trim("postcode")
    )


def canonicalise_postcode(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:61-90 — single space between outward/inward codes
    return df.withColumn(
        "postcode", F.regexp_replace(F.col("postcode"), UK_POSTCODE_REGEX, r"$1 $2")
    )


def upper_case_address_and_postcode(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:20-31
    return df.withColumn("address_concat", F.upper("address_concat")).withColumn(
        "postcode", F.upper("postcode")
    )


def clean_address_string_first_pass(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:93-119 — nested regex chain, same order
    c = "address_concat"
    for fn in (
        remove_commas_periods_sql,
        remove_apostrophes_sql,
        remove_multiple_spaces_sql,
        replace_fwd_slash_with_dash_sql,
        standarise_num_dash_num_sql,
        separate_letter_num_sql,
        standarise_num_letter_sql,
        move_flat_to_front_sql,
        remove_repeated_tokens_sql,
    ):
        c = fn(c)
    return df.withColumn("address_concat", F.expr(f"trim({c})"))


def remove_duplicate_end_tokens(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:260-286. DuckDB [:-2] drops ONE trailing token,
    # [:-3] drops TWO (verified).
    def dedupe(t: str) -> str:
        last = f"try_element_at({t}, -1)"
        last2 = f"try_element_at({t}, -2)"
        last3 = f"try_element_at({t}, -3)"
        last4 = f"try_element_at({t}, -4)"
        return X.cascade(
            [
                (
                    f"size({t}) >= 2 AND {last} = {last2}",
                    f"array_join(slice({t}, 1, size({t}) - 1), ' ')",
                ),
                (
                    f"size({t}) >= 4 AND {last4} = {last2} AND {last3} = {last}",
                    f"array_join(slice({t}, 1, size({t}) - 2), ' ')",
                ),
                (None, f"array_join({t}, ' ')"),
            ]
        )

    # let-bound: the token array (and transitively the upstream cleaning
    # chain) is evaluated once per row instead of ~12x
    return df.withColumn(
        "address_concat", F.expr(X.let("split(address_concat, ' ')", dedupe))
    )


def derive_original_address_concat(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:34-44 — snapshot after first-pass clean + dupe-end removal
    return df.withColumn("original_address_concat", F.col("address_concat"))


FLOOR_POSITIONS_RE = (
    r"\b(BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR|TOP FLOOR|GARDEN)\b"
)
FLAT_LETTER_RE = r"\b\d{0,4}([A-Za-z])\b"
LEADING_LETTER_RE = r"^\s*\d+([A-Za-z])\b"
FLAT_NUMBER_RE = r"\b(FLAT|UNIT|APARTMENT)\s+(\S*\d\S*)\s+\S*\d\S*\b"


def parse_out_flat_position_and_letter(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:122-169. NOTE: the reference extracts GROUP 1 of
    # FLAT_NUMBER_RE — the keyword itself, not the number (verified against
    # DuckDB); 'FLAT'/'UNIT' (len<=4) can therefore land in flat_letter.
    # Reproduced faithfully for scoring parity.
    addr = "address_concat"
    floor_pos = f"regexp_extract({addr}, {X.q(FLOOR_POSITIONS_RE)}, 1)"
    flat_letter = f"regexp_extract({addr}, {X.q(FLAT_LETTER_RE)}, 1)"
    leading_letter = f"regexp_extract({addr}, {X.q(LEADING_LETTER_RE)}, 1)"
    flat_number = f"regexp_extract({addr}, {X.q(FLAT_NUMBER_RE)}, 1)"
    return df.withColumns(
        {
            "flat_positional": F.expr(f"nullif({floor_pos}, '')"),
            "flat_letter": F.expr(
                f"nullif(coalesce(nullif({flat_letter}, ''), "
                f"nullif({leading_letter}, ''), "
                f"CASE WHEN length({flat_number}) <= 4 THEN {flat_number} END), '')"
            ),
        }
    )


NUMERIC_TOKEN_RE = r"\b(\d{1,5}-\d{1,5}|[A-Za-z]?\d{1,5}[A-Za-z]?)\b"


def parse_out_numbers(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:172-211 — numeric tokens out of the address; if
    # flat_letter is purely numeric the first numeric token is dropped
    # (it duplicates the flat number).
    def split_out(addr: str) -> str:
        def pick(all_nums: str) -> str:
            digits_re = X.q(r"^\d+$")
            return (
                f"CASE WHEN flat_letter IS NOT NULL AND "
                f"flat_letter RLIKE {digits_re} "
                f"THEN slice({all_nums}, 2, greatest(size({all_nums}) - 1, 0)) "
                f"ELSE {all_nums} END"
            )

        nums = X.let(
            f"regexp_extract_all({addr}, {X.q(NUMERIC_TOKEN_RE)}, 0)", pick
        )
        return (
            f"named_struct('awn', regexp_replace({addr}, {X.q(NUMERIC_TOKEN_RE)}, ''), "
            f"'nums', {nums})"
        )

    # double let-binding: the (collapsed, regex-heavy) address expression
    # and the extract_all array are each evaluated once per row
    df = df.withColumn("__nums", F.expr(X.let("address_concat", split_out)))
    return df.withColumns(
        {
            "address_without_numbers": F.col("__nums")["awn"],
            "numeric_tokens": F.col("__nums")["nums"],
        }
    ).drop("__nums")


def clean_address_string_second_pass(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:214-228
    return df.withColumn(
        "address_without_numbers",
        F.expr(f"trim({remove_multiple_spaces_sql('address_without_numbers')})"),
    )


def split_numeric_tokens_to_cols(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:231-243 — digit runs only ('21A' -> '21'; '23-24' -> 23,24)
    digit_re = X.q(r"\d+")
    digits = (
        f"regexp_extract_all(array_join(numeric_tokens, ' '), {digit_re}, 0)"
    )
    split3 = X.let(
        digits,
        lambda d: (
            f"named_struct('n1', try_element_at({d}, 1), "
            f"'n2', try_element_at({d}, 2), 'n3', try_element_at({d}, 3))"
        ),
    )
    return (
        df.withColumn("__d3", F.expr(split3))
        .withColumns(
            {
                "numeric_token_1": F.col("__d3")["n1"],
                "numeric_token_2": F.col("__d3")["n2"],
                "numeric_token_3": F.col("__d3")["n3"],
            }
        )
        .drop("numeric_tokens", "__d3")
    )


def tokenise_address_without_numbers(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:246-257
    ws_re = X.q(r"\s+")
    return df.withColumn(
        "address_without_numbers_tokenised",
        F.expr(f"split(trim(address_without_numbers), {ws_re})"),
    ).drop("address_without_numbers")


# ---------------------------------------------------------------------------
# Term-frequency attachment (cleaning_steps.py:326-408)
# ---------------------------------------------------------------------------

TF_DEFAULT_REL_FREQ = 5e-5  # cleaning_steps.py:339


def add_term_frequencies(df: DataFrame, rel_tok_freq: DataFrame) -> DataFrame:
    """Attach (tok, rel_freq) structs per token, preserving token order.

    Join-based formulation: posexplode -> broadcast left join on token ->
    re-assemble with array_sort(collect_list(struct(pos,...))) (collect_list
    alone is unordered). One shuffle on unique_id. For the shuffle-free
    scale path see :func:`add_term_frequencies_broadcast`.
    """
    exploded = df.select(
        "unique_id",
        F.posexplode_outer("address_without_numbers_tokenised").alias("pos", "token"),
    )
    joined = exploded.join(F.broadcast(rel_tok_freq), "token", "left").select(
        "unique_id",
        "pos",
        "token",
        F.coalesce("rel_freq", F.lit(TF_DEFAULT_REL_FREQ)).alias("rel_freq"),
    )
    assembled = joined.groupBy("unique_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token", "rel_freq"))),
            lambda s: F.struct(
                s["token"].alias("tok"), s["rel_freq"].alias("rel_freq")
            ),
        ).alias("token_rel_freq_arr")
    )
    return df.join(assembled, "unique_id").drop("address_without_numbers_tokenised")


def add_term_frequencies_broadcast(df: DataFrame, rel_tok_freq: DataFrame) -> DataFrame:
    """Shuffle-free TF attachment: broadcast the TF table as a dict into an
    Arrow-batched pandas UDF and map each token array in place.

    The reference needs a join because SQL has no broadcast-variable
    concept (cleaning_steps.py:337-342 + the re-assembly join at 360-366);
    on Spark the idiomatic scale path is a broadcast lookup inside a
    vectorized UDF: zero shuffles, plan stays embarrassingly parallel.
    ~300k-token TF tables are a few tens of MB — well under broadcast
    limits.
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    tf_map = {r["token"]: r["rel_freq"] for r in rel_tok_freq.collect()}
    btf = spark.sparkContext.broadcast(tf_map)

    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("tok", T.StringType()),
                T.StructField("rel_freq", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def attach(tokens: pd.Series) -> pd.Series:
        tf = btf.value
        default = TF_DEFAULT_REL_FREQ
        return tokens.map(
            lambda arr: None
            if arr is None
            else [{"tok": t, "rel_freq": tf.get(t, default)} for t in arr]
        )

    return df.withColumn(
        "token_rel_freq_arr", attach(F.col("address_without_numbers_tokenised"))
    ).drop("address_without_numbers_tokenised")


# ---------------------------------------------------------------------------
# Post-TF steps
# ---------------------------------------------------------------------------


def move_common_end_tokens_to_field(df: DataFrame, end_tokens: list[str]) -> DataFrame:
    # cleaning_steps.py:484-550 — common trailing tokens (e.g. LONDON) into
    # their own field; the side table arrives as a small Python list and is
    # inlined as an array literal (the reference cross-joins a 1-row table).
    end_lit = (
        "array(" + ", ".join(X.q(t) for t in end_tokens) + ")"
        if end_tokens
        else "cast(array() as array<string>)"
    )

    def split_ends(arr: str) -> str:
        x1, x2, i2 = X.gensym("x"), X.gensym("x"), X.gensym("i")
        last3 = (
            f"CASE WHEN size({arr}) >= 3 THEN slice({arr}, -3, 3) ELSE {arr} END"
        )
        common = (
            f"filter({last3}, {x1} -> array_contains({end_lit}, {x1}.tok))"
        )
        # DuckDB (x,i) is 1-based: `i > len-2` selects the last two
        # positions; 0-based equivalent: i >= size-2
        remaining = (
            f"filter({arr}, ({x2}, {i2}) -> NOT ({i2} >= size({arr}) - 2 "
            f"AND array_contains({end_lit}, {x2}.tok)))"
        )
        return f"named_struct('common', {common}, 'remaining', {remaining})"

    df = df.withColumn("__ends", F.expr(X.let("token_rel_freq_arr", split_ends)))
    return df.withColumns(
        {
            "common_end_tokens": F.col("__ends")["common"],
            "token_rel_freq_arr": F.col("__ends")["remaining"],
        }
    ).drop("__ends")


def first_unusual_token(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:411-425
    x = X.gensym("x")
    return df.withColumn(
        "first_unusual_token",
        F.expr(
            f"try_element_at(filter(token_rel_freq_arr, "
            f"{x} -> {x}.rel_freq < 0.001D), 1)"
        ),
    )


def use_first_unusual_token_if_no_numeric_token(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:428-448
    x = X.gensym("x")
    new_num1 = (
        "CASE WHEN numeric_token_1 IS NULL THEN first_unusual_token.tok "
        "ELSE numeric_token_1 END"
    )
    new_arr = (
        f"CASE WHEN numeric_token_1 IS NULL THEN "
        f"filter(token_rel_freq_arr, {x} -> "
        f"coalesce({x}.tok != first_unusual_token.tok, true)) "
        f"ELSE token_rel_freq_arr END"
    )
    return (
        df.withColumn("__n1", F.expr(new_num1))
        .withColumn("token_rel_freq_arr", F.expr(new_arr))
        .drop("numeric_token_1", "first_unusual_token")
        .withColumnRenamed("__n1", "numeric_token_1")
    )


def _sorted_by_freq(arr: Column) -> Column:
    # stable sort by rel_freq (DuckDB list_grade_up), tie-broken by position
    keyed = F.transform(
        arr,
        lambda x, i: F.struct(
            x["rel_freq"].alias("rel_freq"), i.alias("pos"), x["tok"].alias("tok")
        ),
    )
    return F.array_sort(keyed)


def _sorted_by_freq_sql(arr: str) -> str:
    x, i = X.gensym("x"), X.gensym("i")
    return (
        f"array_sort(transform({arr}, ({x}, {i}) -> named_struct("
        f"'rel_freq', {x}.rel_freq, 'pos', {i}, 'tok', {x}.tok)))"
    )


def separate_unusual_tokens(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:553-582 — rarity bands, ordered by rel_freq asc

    def bands(sorted_arr: str) -> str:
        def band(lo: float | None, hi: float | None) -> str:
            x, y = X.gensym("x"), X.gensym("y")
            preds = ["true"]
            if lo is not None:
                preds.append(f"{x}.rel_freq >= {X.d(lo)}")
            if hi is not None:
                preds.append(f"{x}.rel_freq < {X.d(hi)}")
            pred = " AND ".join(preds)
            return (
                f"transform(filter({sorted_arr}, {x} -> {pred}), {y} -> {y}.tok)"
            )

        return (
            f"named_struct('unusual', {band(5e-5, 1e-4)}, "
            f"'very_unusual', {band(1e-7, 5e-5)}, "
            f"'extremely_unusual', {band(None, 1e-7)})"
        )

    df = df.withColumn(
        "__bands", F.expr(X.let(_sorted_by_freq_sql("token_rel_freq_arr"), bands))
    )
    return df.withColumns(
        {
            "unusual_tokens_arr": F.col("__bands")["unusual"],
            "very_unusual_tokens_arr": F.col("__bands")["very_unusual"],
            "extremely_unusual_tokens_arr": F.col("__bands")["extremely_unusual"],
        }
    ).drop("__bands")


def _histogram_arr(arr: Column) -> Column:
    """array<struct<tok,rel_freq>> -> tok-sorted array<struct<tok,cnt,rel_freq>>.

    Carries the same information as the reference's MAP(STRUCT, UBIGINT)
    histogram (SURVEY §1.2: tok uniquely determines rel_freq per record),
    but as a SORTED ARRAY rather than a map: Tungsten encodes arrays far
    more cheaply than maps in both shuffle rows and parquet pages, and the
    scoring intersection becomes a linear merge over the two sorted sides
    instead of per-entry map probes (scoring.hist_intersection_product).
    NULL (not an empty array) when the source array is empty — matching
    DuckDB list_aggregate(_, 'histogram').
    """
    def hist(a: Column) -> Column:
        h = F.array_sort(
            F.transform(
                F.array_distinct(a),
                lambda s: F.struct(
                    s["tok"].alias("tok"),
                    F.size(F.filter(a, lambda y: y["tok"] == s["tok"]))
                    .cast("long")
                    .alias("cnt"),
                    s["rel_freq"].alias("rel_freq"),
                ),
            )
        )
        return F.when(F.size(a) > 0, h)

    return let(arr, hist)


def _histogram_arr_sql(arr: str) -> str:
    """SQL-text twin of :func:`_histogram_arr` (same tree, one parse)."""

    def hist(a: str) -> str:
        s, y = X.gensym("s"), X.gensym("y")
        h = (
            f"array_sort(transform(array_distinct({a}), {s} -> named_struct("
            f"'tok', {s}.tok, "
            f"'cnt', cast(size(filter({a}, {y} -> {y}.tok = {s}.tok)) as bigint), "
            f"'rel_freq', {s}.rel_freq)))"
        )
        return f"CASE WHEN size({a}) > 0 THEN {h} END"

    return X.let(arr, hist)


# ---------------------------------------------------------------------------
# Optional adjacency feature (cleaning_steps.py:585-721; default OFF in the
# reference — cleaning_pipelines.py:118)
# ---------------------------------------------------------------------------

_ADJ_REMOVE = ["FLAT", "APARTMENT", "UNIT"]


def separate_distinguishing_start_tokens_wrt_adjacent_records(
    df: DataFrame, partition_col: str | None = None
) -> DataFrame:
    """Split each address into tokens unique to it vs tokens shared with
    its neighbours when sorted by reverse(address_concat).

    Faithful to the reference including its off-by-one (the correlated
    max(i) understates the true common-suffix length by one when the whole
    shorter list matches is impossible; cleaning_steps.py:624-636) and the
    NULL-when-no-overlap behaviour.

    ``partition_col`` bounds the sort window (e.g. postcode sector) — the
    reference uses a single global window (cleaning_steps.py:609), which
    cannot scale; per-sector ordering is the documented relaxation
    (SURVEY §2.5). Default None keeps exact reference semantics.
    """
    from pyspark.sql import Window

    remove_lit = F.array(*[F.lit(t) for t in _ADJ_REMOVE])
    toks = F.filter(
        F.split(F.col("address_concat"), r"\s+"),
        lambda x: ~F.array_contains(remove_lit, x),
    )
    if partition_col is None:
        w = Window.orderBy(F.reverse(F.col("address_concat")))
    else:
        w = Window.partitionBy(partition_col).orderBy(
            F.reverse(F.col("address_concat"))
        )
    df = (
        df.withColumn("__toks_adj", toks)
        .withColumn("__prev", F.lag("__toks_adj").over(w))
        .withColumn("__next", F.lead("__toks_adj").over(w))
    )

    def suffix_len(t: Column, p: Column) -> Column:
        # max i in [0, min-1] with equal length-(i+1) reversed prefixes;
        # NULL when even the last tokens differ (reference subquery result)
        rev_t, rev_p = F.reverse(t), F.reverse(p)
        n = F.least(F.size(t), F.size(p))
        matches = F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.slice(rev_t, 1, i + 1) == F.slice(rev_p, 1, i + 1),
        )
        return F.when(p.isNotNull() & (n >= 1), F.array_max(matches)).otherwise(
            F.when(p.isNull(), F.lit(0))
        )

    t = F.col("__toks_adj")
    df = df.withColumn(
        "__max_suffix",
        F.greatest(
            suffix_len(t, F.col("__prev")), suffix_len(t, F.col("__next"))
        ),
    )
    cnt = F.size(t)
    unique_toks = F.filter(t, lambda x, i: i < cnt - F.col("__max_suffix"))
    common_toks = F.filter(t, lambda x, i: i >= cnt - F.col("__max_suffix"))
    return (
        df.withColumn(
            "distinguishing_adj_start_tokens",
            F.coalesce(unique_toks, F.array().cast("array<string>")),
        )
        .withColumn(
            "common_adj_start_tokens",
            F.coalesce(common_toks, F.array().cast("array<string>")),
        )
        .drop("__toks_adj", "__prev", "__next", "__max_suffix")
    )


def generalised_token_aliases(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:663-721 — guide matches away from implausible
    # floor-level pairings
    def alias_of(tok: Column) -> Column:
        return (
            F.when(
                tok.isin("FIRST", "SECOND", "THIRD", "TOP"),
                F.array(F.lit("UPPERFLOOR"), F.lit("LEVEL")),
            )
            .when(tok.isin("GARDEN", "GROUND"), F.array(F.lit("GROUNDFLOOR"), F.lit("LEVEL")))
            .when(tok == "BASEMENT", F.array(F.lit("LEVEL")))
            .otherwise(F.array(tok))
        )

    return df.withColumn(
        "distinguishing_adj_token_aliases",
        F.flatten(
            F.transform(F.col("distinguishing_adj_start_tokens"), alias_of)
        ),
    )


FINAL_COLUMNS = [
    "unique_id",
    "numeric_token_1",
    "numeric_token_2",
    "numeric_token_3",
    "token_rel_freq_arr_hist",
    "common_end_tokens_hist",
    "postcode",
    "original_address_concat",
    "flat_positional",
    "flat_letter",
    "unusual_tokens_arr",
    "very_unusual_tokens_arr",
    "extremely_unusual_tokens_arr",
]


def final_column_order(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:451-481 — histograms + canonical column order;
    # extra user columns pass through after the contract columns
    df = df.withColumns(
        {
            "token_rel_freq_arr_hist": F.expr(_histogram_arr_sql("token_rel_freq_arr")),
            "common_end_tokens_hist": F.expr(_histogram_arr_sql("common_end_tokens")),
        }
    )
    extra = [
        c
        for c in df.columns
        if c not in FINAL_COLUMNS
        and c not in ("token_rel_freq_arr", "common_end_tokens", "address_concat")
    ]
    return df.select(*FINAL_COLUMNS, *extra)
