"""Address-cleaning steps as pure DataFrame -> DataFrame transformations.

Each step re-expresses one cleaning stage of the reference pipeline
(/root/reference/uk_address_matcher/cleaning/cleaning_steps.py and
regexes.py) as Catalyst expressions — no SQL strings, no Python UDFs.
The whole queue fuses into a handful of whole-stage-codegen projections.

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
# String-level regex battery (reference: cleaning/regexes.py)
# ---------------------------------------------------------------------------


def remove_commas_periods(c: Column) -> Column:
    return F.regexp_replace(c, r"[,.]", " ")


def remove_apostrophes(c: Column) -> Column:
    return F.regexp_replace(c, r"'", "")


def remove_multiple_spaces(c: Column) -> Column:
    return F.regexp_replace(c, r"\s+", " ")


def replace_fwd_slash_with_dash(c: Column) -> Column:
    return F.regexp_replace(c, r"/", "-")


def standarise_num_dash_num(c: Column) -> Column:
    # '23A - 24' -> '23A-24' (regexes.py:16-39; intent active here, see module doc)
    return F.regexp_replace(
        c,
        r"(?<![A-Za-z])(\d+[A-Za-z]?)\s*-\s*(\d+[A-Za-z]?)(?![A-Za-z])",
        r"$1-$2",
    )


def separate_letter_num(c: Column) -> Column:
    # 'C230' -> 'C 230' (regexes.py:106-129)
    return F.regexp_replace(c, r"\b([A-Za-z])\s*(\d+)\b", r"$1 $2")


def standarise_num_letter(c: Column) -> Column:
    # '123-A ' -> '123A ' (regexes.py:78-103; [[:punct:]] -> \p{Punct})
    return F.regexp_replace(c, r"(\d{1,4})[\p{Punct}\s]([A-Za-z])\s", r"$1$2 ")


def move_flat_to_front(c: Column) -> Column:
    # regexes.py:132-153 — despite its name this only rewrites the matched
    # suffix in place ('\1 \2'), normalising whitespace after 'FLAT n'
    return F.regexp_replace(c, r"\b(FLAT \d+[A-Z]?)\s+(.*)", r"$1 $2")


def remove_repeated_tokens(c: Column) -> Column:
    # 'word word' -> 'word' (regexes.py:48-71; intent active here)
    return F.regexp_replace(c, r"\b(\w{4,})\s+\1\b", r"$1")


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
    c = F.col("address_concat")
    for fn in (
        remove_commas_periods,
        remove_apostrophes,
        remove_multiple_spaces,
        replace_fwd_slash_with_dash,
        standarise_num_dash_num,
        separate_letter_num,
        standarise_num_letter,
        move_flat_to_front,
        remove_repeated_tokens,
    ):
        c = fn(c)
    return df.withColumn("address_concat", F.trim(c))


def remove_duplicate_end_tokens(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:260-286. DuckDB [:-2] drops ONE trailing token,
    # [:-3] drops TWO (verified).
    def dedupe(toks: Column) -> Column:
        n = F.size(toks)
        last = F.try_element_at(toks, F.lit(-1))
        last2 = F.try_element_at(toks, F.lit(-2))
        last3 = F.try_element_at(toks, F.lit(-3))
        last4 = F.try_element_at(toks, F.lit(-4))
        return (
            F.when(
                (n >= 2) & (last == last2), F.array_join(F.slice(toks, 1, n - 1), " ")
            )
            .when(
                (n >= 4) & (last4 == last2) & (last3 == last),
                F.array_join(F.slice(toks, 1, n - 2), " "),
            )
            .otherwise(F.array_join(toks, " "))
        )

    # let-bound: the token array (and transitively the upstream cleaning
    # chain) is evaluated once per row instead of ~12x
    new_addr = let(F.split(F.col("address_concat"), " "), dedupe)
    return df.withColumn("address_concat", new_addr)


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
    addr = F.col("address_concat")
    floor_pos = F.regexp_extract(addr, FLOOR_POSITIONS_RE, 1)
    flat_letter = F.regexp_extract(addr, FLAT_LETTER_RE, 1)
    leading_letter = F.regexp_extract(addr, LEADING_LETTER_RE, 1)
    flat_number = F.regexp_extract(addr, FLAT_NUMBER_RE, 1)
    return df.withColumn("flat_positional", F.nullif(floor_pos, F.lit(""))).withColumn(
        "flat_letter",
        F.nullif(
            F.coalesce(
                F.nullif(flat_letter, F.lit("")),
                F.nullif(leading_letter, F.lit("")),
                F.when(F.length(flat_number) <= 4, flat_number),
            ),
            F.lit(""),
        ),
    )


NUMERIC_TOKEN_RE = r"\b(\d{1,5}-\d{1,5}|[A-Za-z]?\d{1,5}[A-Za-z]?)\b"


def parse_out_numbers(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:172-211 — numeric tokens out of the address; if
    # flat_letter is purely numeric the first numeric token is dropped
    # (it duplicates the flat number).
    def split_out(addr: Column) -> Column:
        def pick(all_nums: Column) -> Column:
            return F.when(
                F.col("flat_letter").isNotNull()
                & F.col("flat_letter").rlike(r"^\d+$"),
                F.slice(all_nums, 2, F.greatest(F.size(all_nums) - 1, F.lit(0))),
            ).otherwise(all_nums)

        return F.struct(
            F.regexp_replace(addr, NUMERIC_TOKEN_RE, "").alias("awn"),
            let(
                F.regexp_extract_all(addr, F.lit(NUMERIC_TOKEN_RE), F.lit(0)), pick
            ).alias("nums"),
        )

    # double let-binding: the (collapsed, regex-heavy) address expression
    # and the extract_all array are each evaluated once per row
    df = df.withColumn("__nums", let(F.col("address_concat"), split_out))
    return (
        df.withColumn("address_without_numbers", F.col("__nums")["awn"])
        .withColumn("numeric_tokens", F.col("__nums")["nums"])
        .drop("__nums")
    )


def clean_address_string_second_pass(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:214-228
    return df.withColumn(
        "address_without_numbers",
        F.trim(remove_multiple_spaces(F.col("address_without_numbers"))),
    )


def split_numeric_tokens_to_cols(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:231-243 — digit runs only ('21A' -> '21'; '23-24' -> 23,24)
    digits = F.regexp_extract_all(
        F.array_join(F.col("numeric_tokens"), " "), F.lit(r"\d+"), F.lit(0)
    )
    split3 = let(
        digits,
        lambda d: F.struct(
            F.try_element_at(d, F.lit(1)).alias("n1"),
            F.try_element_at(d, F.lit(2)).alias("n2"),
            F.try_element_at(d, F.lit(3)).alias("n3"),
        ),
    )
    return (
        df.withColumn("__d3", split3)
        .withColumn("numeric_token_1", F.col("__d3")["n1"])
        .withColumn("numeric_token_2", F.col("__d3")["n2"])
        .withColumn("numeric_token_3", F.col("__d3")["n3"])
        .drop("numeric_tokens", "__d3")
    )


def tokenise_address_without_numbers(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:246-257
    return df.withColumn(
        "address_without_numbers_tokenised",
        F.split(F.trim(F.col("address_without_numbers")), r"\s+"),
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
    end_lit = F.array(*[F.lit(t) for t in end_tokens]) if end_tokens else F.array().cast(
        "array<string>"
    )

    def split_ends(arr: Column) -> Column:
        n = F.size(arr)
        last3 = F.when(n >= 3, F.slice(arr, -3, 3)).otherwise(arr)
        common = F.filter(last3, lambda x: F.array_contains(end_lit, x["tok"]))
        # DuckDB (x,i) is 1-based: `i > len-2` selects the last two
        # positions; 0-based equivalent: i >= size-2
        remaining = F.filter(
            arr,
            lambda x, i: ~((i >= n - 2) & F.array_contains(end_lit, x["tok"])),
        )
        return F.struct(common.alias("common"), remaining.alias("remaining"))

    df = df.withColumn("__ends", let(F.col("token_rel_freq_arr"), split_ends))
    return (
        df.withColumn("common_end_tokens", F.col("__ends")["common"])
        .withColumn("token_rel_freq_arr", F.col("__ends")["remaining"])
        .drop("__ends")
    )


def first_unusual_token(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:411-425
    return df.withColumn(
        "first_unusual_token",
        F.try_element_at(
            F.filter(F.col("token_rel_freq_arr"), lambda x: x["rel_freq"] < 0.001),
            F.lit(1),
        ),
    )


def use_first_unusual_token_if_no_numeric_token(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:428-448
    fut = F.col("first_unusual_token")
    no_num = F.col("numeric_token_1").isNull()
    new_num1 = F.when(no_num, fut["tok"]).otherwise(F.col("numeric_token_1"))
    new_arr = F.when(
        no_num,
        F.filter(
            F.col("token_rel_freq_arr"),
            lambda x: F.coalesce(x["tok"] != fut["tok"], F.lit(True)),
        ),
    ).otherwise(F.col("token_rel_freq_arr"))
    return (
        df.withColumn("__n1", new_num1)
        .withColumn("token_rel_freq_arr", new_arr)
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


def separate_unusual_tokens(df: DataFrame) -> DataFrame:
    # cleaning_steps.py:553-582 — rarity bands, ordered by rel_freq asc

    def bands(sorted_arr: Column) -> Column:
        def band(lo: float | None, hi: float | None) -> Column:
            def pred(x):
                p = F.lit(True)
                if lo is not None:
                    p = p & (x["rel_freq"] >= lo)
                if hi is not None:
                    p = p & (x["rel_freq"] < hi)
                return p

            return F.transform(F.filter(sorted_arr, pred), lambda x: x["tok"])

        return F.struct(
            band(5e-5, 1e-4).alias("unusual"),
            band(1e-7, 5e-5).alias("very_unusual"),
            band(None, 1e-7).alias("extremely_unusual"),
        )

    df = df.withColumn(
        "__bands", let(_sorted_by_freq(F.col("token_rel_freq_arr")), bands)
    )
    return (
        df.withColumn("unusual_tokens_arr", F.col("__bands")["unusual"])
        .withColumn("very_unusual_tokens_arr", F.col("__bands")["very_unusual"])
        .withColumn("extremely_unusual_tokens_arr", F.col("__bands")["extremely_unusual"])
        .drop("__bands")
    )


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
    df = df.withColumn(
        "token_rel_freq_arr_hist", _histogram_arr(F.col("token_rel_freq_arr"))
    ).withColumn("common_end_tokens_hist", _histogram_arr(F.col("common_end_tokens")))
    extra = [
        c
        for c in df.columns
        if c not in FINAL_COLUMNS
        and c not in ("token_rel_freq_arr", "common_end_tokens", "address_concat")
    ]
    return df.select(*FINAL_COLUMNS, *extra)
