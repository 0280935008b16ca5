"""Fellegi-Sunter pairwise scoring: 8 comparisons, first-match-wins levels.

The model is the reference's hard-coded one
(/root/reference/uk_address_matcher/linking_model/training.py:11-587,
persisted as data/splink_model.json): prior
probability_two_random_records_match = 3e-8; each comparison is a CASE
cascade whose stored "m_probability" values are literally Bayes factors
because u is fixed at 1 (training.py:42 uses 2^weight) except where noted
(num_3, original_address_concat, common_end, postcode carry explicit m/u
pairs -> BF = m/u).

match_weight = log2(prior odds) + sum(log2(BF_c)); p = 2^w / (1 + 2^w).

Spark realisation: one wide projection computing all comparison BFs as
when-cascades over the joined pair row; the 34-level histogram comparison
computes its product expression ONCE (let-bound) and buckets it with a
when ladder — the reference re-inlines the product per level
(splink_model.json:337-607), which we deliberately do not.

TF adjustment (Splink public semantics): on a matched level with
tf_adjustment_column c and weight w, BF *= (u_level / tf(c))^w with
tf = greatest(tf_l, tf_r) from the numeric-token TF table; no adjustment
when the value is absent. (training.py:176-178, 242-244, 293-295, 302-304)
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from uk_address_matcher_spark import sqlexpr as X
from uk_address_matcher_spark.cleaning.steps import let

PRIOR_P = 3e-8
PRIOR_LOG2_ODDS = math.log2(PRIOR_P / (1 - PRIOR_P))


def _w2bf(weight: float) -> float:
    return float(2.0**weight)


def hist_intersection_product(hl: Column, hr: Column) -> Column:
    """Product over tokens present in both histograms of
    rel_freq ^ min(cnt_l, cnt_r); 1.0 when no overlap.

    Reference: array_reduce_by_freq, training.py:323-357.

    Histograms are ``array<struct<tok,cnt,rel_freq>>`` with distinct toks
    per side (steps._histogram_arr): one aggregate over the left side with
    a filter-probe into the right. Address histograms are short (<~15
    entries), so the O(n_l * n_r) probe beats both the previous map
    encoding (Spark map lookups are O(n) scans over UnsafeMapData, and map
    columns are the expensive payload in every shuffle/encode) and a
    concat + array_sort merge (measured 7.0s vs 9.1s per 3.7M pairs on
    32 cores — the sort comparator costs more than the short probes).
    """

    def body(e: Column) -> Column:
        hit = F.try_element_at(
            F.filter(hr, lambda y: y["tok"] == e["tok"]), F.lit(1)
        )
        return F.coalesce(
            F.when(
                hit.isNotNull(),
                F.pow(e["rel_freq"], F.least(e["cnt"], hit["cnt"]).cast("double")),
            ),
            F.lit(1.0),
        )

    return F.aggregate(hl, F.lit(1.0), lambda acc, e: acc * body(e))


def _tf_multiplier(u_level: float, tf_weight: float, tf_l: Column, tf_r: Column) -> Column:
    tf = F.greatest(tf_l, tf_r)
    return F.coalesce(
        F.when(tf.isNotNull(), F.pow(F.lit(u_level) / tf, F.lit(tf_weight))),
        F.lit(1.0),
    )


def _cascade(levels: list[tuple[Column, Column]]) -> Column:
    """[(condition, bf_column)] -> first-match-wins BF column."""
    expr = None
    for cond, bf in levels[:-1]:
        expr = F.when(cond, bf) if expr is None else expr.when(cond, bf)
    return expr.otherwise(levels[-1][1])


def _hist_prod_sql(hl: str, hr: str) -> str:
    """SQL-text form of :func:`hist_intersection_product` — identical
    expression tree (probe with filter + try_element_at, pow of
    rel_freq), built as a string so constructing the kernel costs one
    Py4J round-trip instead of thousands (see sqlexpr module doc)."""
    acc, e, y = X.gensym("acc"), X.gensym("e"), X.gensym("y")
    hit = f"try_element_at(filter({hr}, {y} -> {y}.tok = {e}.tok), 1)"
    body = (
        f"coalesce(CASE WHEN {hit} IS NOT NULL THEN "
        f"pow({e}.rel_freq, cast(least({e}.cnt, {hit}.cnt) as double)) END, 1.0D)"
    )
    return f"aggregate({hl}, 1.0D, ({acc}, {e}) -> {acc} * {body})"


def _hist_prod_parallel_sql(prefix: str) -> str:
    """Intersection product over the PARALLEL-ARRAY histogram encoding
    (see score_pairs._compact): per side ``{prefix}_tok`` array<bigint>
    (xxhash64 of tok, side-distinct), ``{prefix}_cnt`` array<bigint>,
    and on the LEFT side ``{prefix}_rf`` array<double> — the product
    reads only the left side's rel_freq (min-cnt exponent, left entry
    order), exactly like :func:`hist_intersection_product`, so the right
    side never ships its rel_freq array at all.

    vs the struct probe (_hist_prod_sql): array_position over a dense
    primitive long array SHORT-CIRCUITS at the first hit where
    filter(...) materialises the whole filtered struct array, and the
    per-entry struct headers disappear from the pair-attach exchange.
    Multiplication order is the left entry order either way, so the
    emitted double is bit-identical.

    MEASURED NEGATIVE RESULT (round 5), recorded so it is not retried:
    lambda HOFs are CodegenFallback, so this expression keeps the whole
    kernel projection OFF whole-stage codegen — we built an unrolled,
    HOF-free twin (fixed-depth product over try_element_at /
    array_position, probe-sized to the corpus max histogram length,
    bit-identical outputs) that put the kernel back INSIDE codegen
    ("* Project" in the plan). It was ~2x MORE executor CPU, not less:
    interleaved kernel A/B at 250k docs / 16 cores, 19.8M pairs —
    HOF 24.3s/704 busy-cpu-s vs unrolled 65.3s/1342 (and 42.9s/1014
    with spark.sql.codegen.hugeMethodLimit=8000, i.e. part of the loss
    is giant generated consume() methods HotSpot refuses to JIT; the
    rest is the unroll evaluating every padded slot where the fold
    walks only the real entries). Catalyst's interpreted fold over
    packed primitive arrays is simply the faster shape here.
    """
    tl, cl_, rl = f"{prefix}_tok_l", f"{prefix}_cnt_l", f"{prefix}_rf_l"
    tr, cr_ = f"{prefix}_tok_r", f"{prefix}_cnt_r"
    t, p, i = X.gensym("t"), X.gensym("p"), X.gensym("i")
    acc, x = X.gensym("acc"), X.gensym("x")
    pos = f"transform({tl}, {t} -> cast(array_position({tr}, {t}) as int))"
    body = (
        f"CASE WHEN {p} > 0 THEN pow(element_at({rl}, {i} + 1), "
        f"cast(least(element_at({cl_}, {i} + 1), element_at({cr_}, {p})) as double)) "
        f"ELSE 1.0D END"
    )
    return (
        f"aggregate(transform({pos}, ({p}, {i}) -> {body}), 1.0D, "
        f"({acc}, {x}) -> {acc} * {x})"
    )


def _tf_mult_sql(u_level: float, tf_weight: float, tf_l: str, tf_r: str) -> str:
    tf = f"greatest({tf_l}, {tf_r})"
    return (
        f"coalesce(CASE WHEN {tf} IS NOT NULL THEN "
        f"pow({X.d(u_level)} / {tf}, {X.d(tf_weight)}) END, 1.0D)"
    )


def _bucket_sql(prod: str) -> str:
    """The 34-level product-threshold ladder as SQL over an arbitrary
    (already-bound) product expression. Non-increasing in ``prod``:
    smaller products hit earlier (higher-weight) levels — the bound
    derivation in score_pairs relies on this monotonicity."""
    return X.cascade(
        [
            (f"{prod} < {X.d(10.0 ** exp)}", X.d(_w2bf(weight)))
            for exp, weight in _token_hist_levels()
        ]
        + [(None, X.d(1 / 256))]
    )


@X.scoped
def comparison_bf_sqls(
    oac_sig: bool = False,
    precomputed_digits: bool = False,
    parallel_hists: bool = False,
    precomputed_pc_parts: bool = False,
) -> dict[str, str]:
    """All 8 comparison BF expressions as SQL text over a suffixed pair
    row (cols *_l/*_r plus tf_numeric_token_{1,2,3}_{l,r}).

    ``oac_sig=True``: comparison 1 reads the null-preserving xxhash64
    signature columns ``__oac_sig_l/_r`` instead of the address strings —
    the equality-only comparison doesn't need the text, and dropping the
    two longest strings from the pair shuffle is a large payload win
    (score_pairs re-attaches the text after the threshold filter).

    ``precomputed_digits=True``: numeric_token_1 level 3 compares the
    per-RECORD ``__nt1_dg_l/_r`` columns (score_pairs._compact extracts
    the digit run once per record) instead of running regexp_extract per
    PAIR — the values are identical by construction, the regex runs n
    times instead of n_pairs times.

    ``parallel_hists=True``: comparisons 6 and 7 read the parallel-array
    histogram encoding (``__th_*``/``__ch_*`` columns, see
    score_pairs._compact and _hist_prod_parallel_sql) instead of the
    array-of-struct histograms — same values, same product order,
    bit-identical BFs.

    ``precomputed_pc_parts=True``: comparison 8 levels 5-6 compare the
    per-RECORD ``__pc_area_l/_r`` / ``__pc_in_l/_r`` columns
    (score_pairs._compact runs split_part once per record) instead of
    split_part per PAIR. This matters far beyond expression count:
    Spark's split_part (StringSplitSQL) routes through
    UTF8String.split -> String.split, which COMPILES A java.util.regex
    Pattern on every call — JFR-profiled at ~25% of the whole scoring
    stage's CPU when the four split_part calls sat on the pair path
    (evaluated for every pair whose postcode equality/levenshtein
    levels miss, i.e. most of them). Values are identical by
    construction (same split_part over the same postcode string,
    including its ''-on-missing-part and NULL-propagation behaviour).

    Why strings: the Column API costs one Py4J round-trip per operator
    node; this kernel has thousands. One ``F.expr`` per comparison
    parses the identical tree JVM-side in milliseconds (all constants
    are Python-computed and embedded with exact round-trip repr, so the
    values are bit-identical to the former ``F.lit`` forms).
    """
    oac_l, oac_r = (
        ("__oac_sig_l", "__oac_sig_r")
        if oac_sig
        else ("original_address_concat_l", "original_address_concat_r")
    )

    # 1. original_address_concat — cl.ExactMatch u=[1,2] m=[15,1] (training.py:14-16)
    oac = X.cascade(
        [
            (f"({oac_l} IS NULL OR {oac_r} IS NULL)", "1.0D"),
            (f"{oac_l} = {oac_r}", X.d(15.0)),
            (None, X.d(1 / 2)),
        ]
    )

    # 2. flat_positional (training.py:94-157)
    fp = X.cascade(
        [
            (
                "(flat_positional_l IS NULL AND flat_positional_r IS NULL "
                "AND flat_letter_l IS NULL AND flat_letter_r IS NULL)",
                "1.0D",
            ),
            ("flat_positional_l = flat_positional_r", X.d(_w2bf(6.57))),
            ("flat_letter_l = flat_letter_r", X.d(_w2bf(6.57))),
            (
                "(flat_letter_l = numeric_token_1_r "
                "OR flat_letter_r = numeric_token_1_l)",
                X.d(_w2bf(0)),
            ),
            (
                "((flat_positional_l IS NOT NULL AND flat_positional_r IS NULL "
                "AND flat_letter_r IS NOT NULL) OR "
                "(flat_positional_r IS NOT NULL AND flat_positional_l IS NULL "
                "AND flat_letter_l IS NOT NULL))",
                X.d(_w2bf(0)),
            ),
            (None, X.d(_w2bf(-5))),
        ]
    )

    # 3. numeric_token_1 (training.py:160-219)
    def digits(col: str) -> str:
        return f"nullif(regexp_extract({col}, '\\\\d+', 0), '')"

    tf1 = _tf_mult_sql(1.0, 0.1, "tf_numeric_token_1_l", "tf_numeric_token_1_r")
    dg_l, dg_r = (
        ("__nt1_dg_l", "__nt1_dg_r")
        if precomputed_digits
        else (digits("numeric_token_1_l"), digits("numeric_token_1_r"))
    )
    n1 = X.cascade(
        [
            ("(numeric_token_1_l IS NULL OR numeric_token_1_r IS NULL)", "1.0D"),
            ("numeric_token_1_l = numeric_token_1_r", f"{X.d(_w2bf(6.57))} * {tf1}"),
            (
                f"{dg_l} = {dg_r}",
                f"{X.d(_w2bf(6.57))} * {tf1}",
            ),
            (
                "(numeric_token_2_l = numeric_token_1_r "
                "OR numeric_token_1_l = numeric_token_2_r)",
                X.d(_w2bf(2)),
            ),
            # level 5 of the reference (NULL OR NULL, weight -4) is shadowed
            # by level 1 — kept out; ELSE:
            (None, X.d(_w2bf(-8))),
        ]
    )

    # 4. numeric_token_2 (training.py:222-273)
    tf2 = _tf_mult_sql(1.0, 0.1, "tf_numeric_token_2_l", "tf_numeric_token_2_r")
    n2 = X.cascade(
        [
            ("(numeric_token_2_l IS NULL AND numeric_token_2_r IS NULL)", "1.0D"),
            ("numeric_token_2_l = numeric_token_2_r", f"{X.d(_w2bf(6.57))} * {tf2}"),
            (
                "(numeric_token_1_l = numeric_token_2_r "
                "OR numeric_token_1_r = numeric_token_2_l)",
                X.d(_w2bf(0)),
            ),
            ("(numeric_token_2_l IS NULL OR numeric_token_2_r IS NULL)", X.d(_w2bf(-2))),
            (None, X.d(_w2bf(-4))),
        ]
    )

    # 5. numeric_token_3 — explicit m/u pairs (training.py:281-320)
    tf3a = _tf_mult_sql(0.0001, 0.5, "tf_numeric_token_3_l", "tf_numeric_token_3_r")
    tf3b = _tf_mult_sql(0.0025, 0.5, "tf_numeric_token_3_l", "tf_numeric_token_3_r")
    n3 = X.cascade(
        [
            ("(numeric_token_3_l IS NULL AND numeric_token_3_r IS NULL)", "1.0D"),
            ("numeric_token_3_l = numeric_token_3_r", f"{X.d(0.6 / 0.0001)} * {tf3a}"),
            ("numeric_token_2_l = numeric_token_3_r", f"{X.d(0.3 / 0.0025)} * {tf3b}"),
            ("(numeric_token_3_l IS NULL OR numeric_token_3_r IS NULL)", X.d(1 / 16)),
            (None, X.d(1 / 256)),
        ]
    )

    # 6. token_rel_freq_arr_hist — 34 product-threshold levels
    #    (training.py:386-455); product computed once (let-bound),
    #    bucketed by the when ladder
    if parallel_hists:
        th_null = "(__th_tok_l IS NULL OR __th_tok_r IS NULL)"
        th_prod = _hist_prod_parallel_sql("__th")
        ch_null = "(__ch_tok_l IS NULL OR __ch_tok_r IS NULL)"
        ch_prod = _hist_prod_parallel_sql("__ch")
    else:
        th_null = (
            "(token_rel_freq_arr_hist_l IS NULL "
            "OR token_rel_freq_arr_hist_r IS NULL)"
        )
        th_prod = _hist_prod_sql(
            "token_rel_freq_arr_hist_l", "token_rel_freq_arr_hist_r"
        )
        ch_null = (
            "(common_end_tokens_hist_l IS NULL "
            "OR common_end_tokens_hist_r IS NULL)"
        )
        ch_prod = _hist_prod_sql(
            "common_end_tokens_hist_l", "common_end_tokens_hist_r"
        )
    tok_hist = X.cascade(
        [
            (th_null, "1.0D"),
            (None, X.let(th_prod, _bucket_sql)),
        ]
    )

    # 7. common_end_tokens (training.py:458-486)
    cet = X.cascade(
        [
            (ch_null, "1.0D"),
            (f"{ch_prod} < {X.d(1e-2)}", X.d(4.0)),
            (None, X.d(1 / 1.5)),
        ]
    )

    # 8. postcode (training.py:489-546)
    if precomputed_pc_parts:
        area_l, area_r = "__pc_area_l", "__pc_area_r"
        in_l, in_r = "__pc_in_l", "__pc_in_r"
    else:
        area_l = "split_part(postcode_l, ' ', 1)"
        area_r = "split_part(postcode_r, ' ', 1)"
        in_l = "split_part(postcode_l, ' ', 2)"
        in_r = "split_part(postcode_r, ' ', 2)"
    pc = X.cascade(
        [
            ("(postcode_l IS NULL AND postcode_r IS NULL)", "1.0D"),
            ("postcode_l = postcode_r", X.d(3e6)),
            ("levenshtein(postcode_l, postcode_r) <= 1", X.d(10000.0)),
            ("levenshtein(postcode_l, postcode_r) <= 2", X.d(5000.0)),
            (f"{area_l} = {area_r}", X.d(3000.0)),
            (f"{in_l} = {in_r}", X.d(2000.0)),
            (None, X.d(1 / 64)),
        ]
    )

    return {
        "bf_original_address_concat": oac,
        "bf_flat_positional": fp,
        "bf_numeric_token_1": n1,
        "bf_numeric_token_2": n2,
        "bf_numeric_token_3": n3,
        "bf_token_rel_freq_arr_hist": tok_hist,
        "bf_common_end_tokens": cet,
        "bf_postcode": pc,
    }


def comparison_bfs(retain_product: bool = False, oac_sig: bool = False) -> dict[str, Column]:
    """All 8 comparison BF columns (Column form of
    :func:`comparison_bf_sqls` — one ``F.expr`` per comparison)."""
    return {name: F.expr(sql) for name, sql in comparison_bf_sqls(oac_sig).items()}


def _comparison_bfs_column_api(oac_sig: bool = False) -> dict[str, Column]:
    """Former Column-API kernel builder, kept verbatim for the
    construction-parity test (tests assert the SQL-text kernel and this
    one produce identical values); not used on the hot path — building
    it costs ~3s of Py4J round-trips.
    """
    c = F.col

    # 1. original_address_concat — cl.ExactMatch u=[1,2] m=[15,1] (training.py:14-16)
    oac_l, oac_r = (
        ("__oac_sig_l", "__oac_sig_r")
        if oac_sig
        else ("original_address_concat_l", "original_address_concat_r")
    )
    oac = _cascade(
        [
            (c(oac_l).isNull() | c(oac_r).isNull(), F.lit(1.0)),
            (c(oac_l) == c(oac_r), F.lit(15.0)),
            (F.lit(True), F.lit(1 / 2)),
        ]
    )

    # 2. flat_positional (training.py:94-157)
    fp = _cascade(
        [
            (
                c("flat_positional_l").isNull()
                & c("flat_positional_r").isNull()
                & c("flat_letter_l").isNull()
                & c("flat_letter_r").isNull(),
                F.lit(1.0),
            ),
            (c("flat_positional_l") == c("flat_positional_r"), F.lit(_w2bf(6.57))),
            (c("flat_letter_l") == c("flat_letter_r"), F.lit(_w2bf(6.57))),
            (
                (c("flat_letter_l") == c("numeric_token_1_r"))
                | (c("flat_letter_r") == c("numeric_token_1_l")),
                F.lit(_w2bf(0)),
            ),
            (
                (
                    c("flat_positional_l").isNotNull()
                    & c("flat_positional_r").isNull()
                    & c("flat_letter_r").isNotNull()
                )
                | (
                    c("flat_positional_r").isNotNull()
                    & c("flat_positional_l").isNull()
                    & c("flat_letter_l").isNotNull()
                ),
                F.lit(_w2bf(0)),
            ),
            (F.lit(True), F.lit(_w2bf(-5))),
        ]
    )

    # 3. numeric_token_1 (training.py:160-219)
    digits = lambda col: F.nullif(F.regexp_extract(col, r"\d+", 0), F.lit(""))  # noqa: E731
    n1 = _cascade(
        [
            (c("numeric_token_1_l").isNull() | c("numeric_token_1_r").isNull(), F.lit(1.0)),
            (
                c("numeric_token_1_l") == c("numeric_token_1_r"),
                F.lit(_w2bf(6.57))
                * _tf_multiplier(1.0, 0.1, c("tf_numeric_token_1_l"), c("tf_numeric_token_1_r")),
            ),
            (
                digits(c("numeric_token_1_l")) == digits(c("numeric_token_1_r")),
                F.lit(_w2bf(6.57))
                * _tf_multiplier(1.0, 0.1, c("tf_numeric_token_1_l"), c("tf_numeric_token_1_r")),
            ),
            (
                (c("numeric_token_2_l") == c("numeric_token_1_r"))
                | (c("numeric_token_1_l") == c("numeric_token_2_r")),
                F.lit(_w2bf(2)),
            ),
            # level 5 of the reference (NULL OR NULL, weight -4) is shadowed
            # by level 1 — kept out; ELSE:
            (F.lit(True), F.lit(_w2bf(-8))),
        ]
    )

    # 4. numeric_token_2 (training.py:222-273)
    n2 = _cascade(
        [
            (c("numeric_token_2_l").isNull() & c("numeric_token_2_r").isNull(), F.lit(1.0)),
            (
                c("numeric_token_2_l") == c("numeric_token_2_r"),
                F.lit(_w2bf(6.57))
                * _tf_multiplier(1.0, 0.1, c("tf_numeric_token_2_l"), c("tf_numeric_token_2_r")),
            ),
            (
                (c("numeric_token_1_l") == c("numeric_token_2_r"))
                | (c("numeric_token_1_r") == c("numeric_token_2_l")),
                F.lit(_w2bf(0)),
            ),
            (c("numeric_token_2_l").isNull() | c("numeric_token_2_r").isNull(), F.lit(_w2bf(-2))),
            (F.lit(True), F.lit(_w2bf(-4))),
        ]
    )

    # 5. numeric_token_3 — explicit m/u pairs (training.py:281-320)
    n3 = _cascade(
        [
            (c("numeric_token_3_l").isNull() & c("numeric_token_3_r").isNull(), F.lit(1.0)),
            (
                c("numeric_token_3_l") == c("numeric_token_3_r"),
                F.lit(0.6 / 0.0001)
                * _tf_multiplier(0.0001, 0.5, c("tf_numeric_token_3_l"), c("tf_numeric_token_3_r")),
            ),
            (
                c("numeric_token_2_l") == c("numeric_token_3_r"),
                F.lit(0.3 / 0.0025)
                * _tf_multiplier(0.0025, 0.5, c("tf_numeric_token_3_l"), c("tf_numeric_token_3_r")),
            ),
            (c("numeric_token_3_l").isNull() | c("numeric_token_3_r").isNull(), F.lit(1 / 16)),
            (F.lit(True), F.lit(1 / 256)),
        ]
    )

    # 6. token_rel_freq_arr_hist — 34 product-threshold levels
    #    (training.py:386-455); product computed once, bucketed by ladder
    levels = _token_hist_levels()

    def bucket(prod: Column) -> Column:
        expr = None
        for threshold_exp, weight in levels:
            cond = prod < float(10.0**threshold_exp)
            bf = F.lit(_w2bf(weight))
            expr = F.when(cond, bf) if expr is None else expr.when(cond, bf)
        return expr.otherwise(F.lit(1 / 256))

    tok_hist = F.when(
        c("token_rel_freq_arr_hist_l").isNull() | c("token_rel_freq_arr_hist_r").isNull(),
        F.lit(1.0),
    ).otherwise(
        let(
            hist_intersection_product(
                c("token_rel_freq_arr_hist_l"), c("token_rel_freq_arr_hist_r")
            ),
            bucket,
        )
    )

    # 7. common_end_tokens (training.py:458-486)
    cet = F.when(
        c("common_end_tokens_hist_l").isNull() | c("common_end_tokens_hist_r").isNull(),
        F.lit(1.0),
    ).otherwise(
        F.when(
            hist_intersection_product(
                c("common_end_tokens_hist_l"), c("common_end_tokens_hist_r")
            )
            < 1e-2,
            F.lit(4.0),
        ).otherwise(F.lit(1 / 1.5))
    )

    # 8. postcode (training.py:489-546)
    pc = _cascade(
        [
            (c("postcode_l").isNull() & c("postcode_r").isNull(), F.lit(1.0)),
            (c("postcode_l") == c("postcode_r"), F.lit(3e6)),
            (F.levenshtein(c("postcode_l"), c("postcode_r")) <= 1, F.lit(10000.0)),
            (F.levenshtein(c("postcode_l"), c("postcode_r")) <= 2, F.lit(5000.0)),
            (
                F.split_part(c("postcode_l"), F.lit(" "), F.lit(1))
                == F.split_part(c("postcode_r"), F.lit(" "), F.lit(1)),
                F.lit(3000.0),
            ),
            (
                F.split_part(c("postcode_l"), F.lit(" "), F.lit(2))
                == F.split_part(c("postcode_r"), F.lit(" "), F.lit(2)),
                F.lit(2000.0),
            ),
            (F.lit(True), F.lit(1 / 64)),
        ]
    )

    return {
        "bf_original_address_concat": oac,
        "bf_flat_positional": fp,
        "bf_numeric_token_1": n1,
        "bf_numeric_token_2": n2,
        "bf_numeric_token_3": n3,
        "bf_token_rel_freq_arr_hist": tok_hist,
        "bf_common_end_tokens": cet,
        "bf_postcode": pc,
    }


def _token_hist_levels() -> list[tuple[int, float]]:
    """(threshold_exponent, weight) pairs, most-negative exponent first —
    generate_arr_reduce_data(4, -4, [8,8,8,10], [1,1,0.25,0.25]) reversed
    (training.py:386-418)."""
    data = []
    current_exp, current_weight = 4, -4.0
    for segment, delta in zip([8, 8, 8, 10], [1.0, 1.0, 0.25, 0.25]):
        for _ in range(segment):
            data.append((current_exp, current_weight))
            current_weight += delta
            current_exp -= 1
    return data[::-1]


def _suffix(df: DataFrame, suffix: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{c}{suffix}") for c in df.columns])


def _sides_broadcastable(cleaned_l: DataFrame, cleaned_r: DataFrame) -> bool:
    """Size gate for broadcasting the side tables into pair-attach joins.

    Two count jobs over the n-record sides (the linkage caller's durable
    cleaning barrier makes these cheap parquet counts) buy the removal of
    an n_pairs-row exchange — at 1M docs that trade is ~2 narrow scans vs
    5.1 GB of intermediate shuffle. The cap is rows, not bytes: a compact
    side row is ~250 B (packed histogram arrays + short strings), so the
    default 2M rows is ~500 MB per broadcast table — sized for >=4 GB
    executors; lower/raise SPARK_GRAFT_BROADCAST_SIDES_ROWS per
    deployment, 0 disables."""
    cap = int(os.environ.get("SPARK_GRAFT_BROADCAST_SIDES_ROWS", "2000000"))
    if cap <= 0:
        return False
    return cleaned_l.count() <= cap and cleaned_r.count() <= cap


def _prod_all_sql(hist: str) -> str:
    # product over ALL of one side's histogram entries of
    # rel_freq^cnt — a LOWER bound on the pairwise intersection
    # product (intersection ⊆ side, min(cnt_l,cnt_r) <= cnt_side,
    # every factor <= 1), hence bucketed it upper-bounds the
    # histogram BF per pair WITHOUT touching the per-pair product.
    # Computed once per RECORD here (n rows), not per pair.
    a, e = X.gensym("a"), X.gensym("e")
    return (
        f"aggregate({hist}, 1.0D, ({a}, {e}) -> "
        f"{a} * pow({e}.rel_freq, cast({e}.cnt as double)))"
    )


def _compact(
    df: DataFrame, keep: list[str], rf: bool = True, with_bounds: bool = False
) -> DataFrame:
    """COMPACT one side's pair-shuffle payload. Every candidate pair (23M
    at 250k docs) carries both sides' comparison inputs through two
    exchanges, but only the ~5% surviving the threshold need display
    columns — measured per-stage executor-CPU shows the attach/scoring
    stages dominated by payload bytes (memory bandwidth) at high
    parallelism:
     - token histogram: tok -> xxhash64(tok), then split into PARALLEL
       primitive arrays (__th_tok array<bigint>, __th_cnt array<bigint>,
       __th_rf array<double> on the left side only — the intersection
       product never reads the right side's rel_freq). Intersection
       needs token EQUALITY only (collision odds inside one pair's
       ~30-token vocabulary: ~2^-59); dense primitive arrays drop the
       per-entry struct headers from the exchange and let the probe
       short-circuit (array_position) instead of filtering.
     - common-end histogram: same encoding (__ch_*; its BF is also
       intersection-only). The STRING form the second pass needs is
       re-attached post-filter.
     - original_address_concat: replaced by a null-preserving xxhash64
       signature (__oac_sig); its BF is equality-only. Text re-attached
       post-filter.

    ``with_bounds`` (the two-stage kernel only) additionally computes the
    per-record full-histogram products feeding the B&B weight bounds —
    the default path must not pay 16 bytes/pair for them through the
    bandwidth-bound pair-attach exchange. ``rf=False`` (the right/messy
    side): the product only ever reads the LEFT side's rel_freq, so the
    right side doesn't ship one."""
    out = df.select(keep)
    for hist, pref, pa in (
        ("token_rel_freq_arr_hist", "__th", "__hist_pa"),
        ("common_end_tokens_hist", "__ch", "__cet_pa"),
    ):
        if hist not in out.columns:
            continue
        if with_bounds:
            out = out.withColumn(pa, F.expr(_prod_all_sql(hist)))
        e1, e2, e3 = X.gensym("e"), X.gensym("e"), X.gensym("e")
        out = out.withColumn(
            f"{pref}_tok", F.expr(f"transform({hist}, {e1} -> xxhash64({e1}.tok))")
        ).withColumn(
            f"{pref}_cnt", F.expr(f"transform({hist}, {e2} -> {e2}.cnt)")
        )
        if rf:
            out = out.withColumn(
                f"{pref}_rf",
                F.expr(f"transform({hist}, {e3} -> {e3}.rel_freq)"),
            )
        out = out.drop(hist)
    if "numeric_token_1" in out.columns:
        # digit run extracted once per record; the n1 cascade's level 3
        # compares these instead of regexp_extract-ing per pair
        out = out.withColumn(
            "__nt1_dg",
            F.expr("nullif(regexp_extract(numeric_token_1, '\\\\d+', 0), '')"),
        )
    if "postcode" in out.columns:
        # postcode area/incode split once per record: split_part on the
        # pair path compiles a java.util.regex Pattern per CALL (see
        # comparison_bf_sqls precomputed_pc_parts) — measured ~25% of
        # scoring-stage CPU before this
        out = out.withColumn(
            "__pc_area", F.expr("split_part(postcode, ' ', 1)")
        ).withColumn("__pc_in", F.expr("split_part(postcode, ' ', 2)"))
    if "original_address_concat" in out.columns:
        out = out.withColumn(
            "__oac_sig",
            F.when(
                F.col("original_address_concat").isNotNull(),
                F.xxhash64("original_address_concat"),
            ),
        ).drop("original_address_concat")
    return out


def attach_numeric_tf(df: DataFrame, numeric_tf: DataFrame, suffix: str) -> DataFrame:
    """Broadcast-join tf_numeric_token_k for k=1..3 on one side's columns."""
    for k in (1, 2, 3):
        tf = F.broadcast(
            numeric_tf.select(
                F.col("numeric_token").alias(f"numeric_token_{k}{suffix}"),
                F.col("tf_numeric_token").alias(f"tf_numeric_token_{k}{suffix}"),
            )
        )
        df = df.join(tf, f"numeric_token_{k}{suffix}", "left")
    return df


@X.scoped
def score_pairs(
    pairs: DataFrame,
    cleaned_l: DataFrame,
    cleaned_r: DataFrame,
    numeric_tf: DataFrame | None = None,
    threshold_match_weight: float | None = None,
    retain_bf: bool = False,
    retain_matching_columns: bool = True,
    attach_display: bool = True,
    prune_top_n: tuple[float, int] | None = None,
    early_exit: bool = False,
    debug_stage_counts: dict | None = None,
) -> DataFrame:
    """(unique_id_l, unique_id_r) pairs -> scored prediction table.

    ``prune_top_n=(thr, n)``: the output is EXACTLY
    ``prune_candidates(full_output, thr, n)`` — weight > thr and rank <= n
    per messy record by (weight DESC, unique_id_l DESC) — fused here so
    the kernel can skip unreachable pairs (see early_exit).

    ``early_exit``: two-stage branch-and-bound kernel — implemented,
    equivalence-tested, and measured; DEFAULT OFF as a data-driven
    decision. On the grid corpus the bound filter removes nothing
    (every blocked pair's upper bound clears -20: blocked pairs share
    street tokens, so bucket(prodall) is within a few bits of the true
    histogram BF for exactly the pairs that matter) and the rank bound
    removes only ~17%, while the bound columns + extra per-group sort
    cost ~15% wall (sf0.1 A/B, min-of-2 per variant across interleaved
    processes: single-stage 35.1s vs two-stage 41.0s, identical 245,821
    predictions — tools/ab_link.py, BENCH/BASELINE.md round 5). Round 6
    tested the hypothesized junk-heavy activation corpus (postcode-skewed:
    50% of rows in 50 postcodes, 6.1M blocked pairs of which most are
    cross-street junk — tools/bnb_probe.py, BENCH/r06_bnb_probe.json):
    the rank bound there removes 68.3% of pairs before stage 2, yet the
    interleaved A/B still loses 5% (single 41.9 s vs bnb 44.3 s min,
    identical 147,915 predictions — BENCH/r06_ab_skew.json), because the
    rank bound's per-group window sort costs as much as the histogram
    products it skips. DECISION RULE: enable early_exit only when
    tools/bnb_probe.py shows ub_cut_pct is large (>~40%) — i.e. the
    CHEAP comparisons alone prove many pairs sub-threshold; a large
    rank-cut alone (68% measured) does NOT pay. No measured corpus
    reaches that, so the default stays single-stage. Mechanism when on: stage 1 computes the six
    CHEAP scalar comparisons (equality/levenshtein on short strings) plus
    sound per-pair bounds on the total weight; the expensive
    token-histogram intersection product (the 34-level ladder, measured
    ~60% of pass-1 CPU) and the common-end product run in stage 2 ONLY
    for pairs whose upper bound clears the threshold and — under
    prune_top_n — the 5th-best lower bound of their messy record's
    candidate group. Bound construction:
     - histogram BF upper bound: bucket(max(prodall_l, prodall_r)) where
       prodall is each side's full product (precomputed per record in
       _compact) — a lower bound on the intersection product since every
       factor is <= 1 (requires rel_freq <= 1, validated at side-table
       build); lower bound: bucket(1.0) = 2^-1 (intersection product
       <= 1.0 always).
     - common-end BF: EXACT in stage 1 when either side is null (1.0) or
       when max(prodall) >= 1e-2 (the product can only be >= that, so
       the <1e-2 level can't fire -> 1/1.5); else bounded [1/1.5, 4.0].
     - bounds are padded by ±1e-9 against float-summation-order drift.
    A pair is dropped only when provably outside the output: upper bound
    <= threshold, or >= n pairs in its group have lower bounds strictly
    above its upper bound (those n then outrank it at ANY tie-break).
    Surviving pairs get their weight from the FULL kernel with terms
    summed in the exact original order, so every emitted weight is
    bit-identical to the single-stage kernel (equivalence-tested).
    ``early_exit=False`` (the default) runs the single-stage kernel.

    ``attach_display=False`` returns the COMPACT scored rows (ids,
    weights, postcodes, numeric/flat tokens, packed histograms, __oac_sig
    signatures) without the re-attach joins — for callers that prune
    further before needing text columns (linkage prunes to the rescoring
    candidate set first, then calls attach_display_columns).

    Two hash joins attach the wide cleaned attributes AFTER pair dedup
    (ids only move through the blocking shuffle), then one projection
    computes all BFs and the weight; the threshold filter sits directly
    above it so Catalyst can prune early.

    ``retain_matching_columns`` mirrors the reference setting of the same
    name (splink_model.py:36): False drops the compared attribute columns
    from the OUTPUT (they are still read for scoring), keeping only ids,
    weights, the address/postcode pair, and common_end_tokens_hist_r (the
    second pass's inputs). Text/histogram columns in the output are
    re-attached from the cleaned tables AFTER the threshold filter — the
    pair exchanges carry only compact signatures (see _compact below). Materialising the full frame costs real time —
    the token-histogram maps dominate the parquet encode of a pass-1
    checkpoint — so drop them when only the second pass consumes the
    output.
    """
    # slim payload: blocking-key arrays (unusual_* bands) are not used by
    # scoring or the second pass — dropping them shrinks the pair-attach
    # shuffle by ~a third
    scoring_cols = [
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
    ]
    keep_l = [c for c in cleaned_l.columns if c in scoring_cols]
    keep_r = [c for c in cleaned_r.columns if c in scoring_cols]

    left = _suffix(_compact(cleaned_l, keep_l, with_bounds=early_exit), "_l")
    right = _suffix(
        _compact(cleaned_r, keep_r, rf=False, with_bounds=early_exit), "_r"
    )
    bcast_sides = _sides_broadcastable(cleaned_l, cleaned_r)
    if bcast_sides:
        # BROADCAST the compact sides: the two-key attach otherwise
        # re-exchanges the (pairs x left-signature) INTERMEDIATE — n_pairs
        # wide rows — to co-locate on unique_id_r (measured 5.1 GB of
        # shuffle read feeding pass-1 at 1M docs / 43M pairs; the write,
        # lz4 both ways and UnsafeRow serde of that intermediate is pure
        # overhead). With both sides broadcast the scan->attach->kernel->
        # threshold-filter pipeline is ONE map-side stage and the 43M-row
        # intermediate never exists off-CPU-cache. Size-gated (env
        # SPARK_GRAFT_BROADCAST_SIDES_ROWS): at cluster scale with
        # billions of side rows the gate fails and the shuffle-hash plan
        # below remains the 100-TB path.
        df = pairs.join(F.broadcast(left), "unique_id_l").join(
            F.broadcast(right), "unique_id_r"
        )
    else:
        # shuffle-hash: sort-merge would sort 10^6-10^9 wide
        # (array-carrying) rows per side; hashing the (small) cleaned
        # side is strictly cheaper
        df = pairs.join(left.hint("shuffle_hash"), "unique_id_l").join(
            right.hint("shuffle_hash"), "unique_id_r"
        )

    if numeric_tf is not None:
        df = attach_numeric_tf(df, numeric_tf, "_l")
        df = attach_numeric_tf(df, numeric_tf, "_r")
    else:
        for k in (1, 2, 3):
            df = df.withColumn(f"tf_numeric_token_{k}_l", F.lit(None).cast("double"))
            df = df.withColumn(f"tf_numeric_token_{k}_r", F.lit(None).cast("double"))

    bf_sqls = comparison_bf_sqls(
        oac_sig=True, precomputed_digits=True, parallel_hists=True,
        precomputed_pc_parts=True,
    )
    prune_thr, top_n = prune_top_n if prune_top_n is not None else (None, None)
    thr_parts = [t for t in (threshold_match_weight, prune_thr) if t is not None]
    thr_eff = max(thr_parts) if thr_parts else None
    use_bnb = early_exit and thr_eff is not None

    if use_bnb:
        df = _two_stage_kernel(
            df, bf_sqls, thr_eff, top_n, retain_bf, debug_stage_counts
        )
    else:
        df = _single_stage_kernel(df, bf_sqls)
    prob_sql = "pow(2.0D, match_weight) / (1.0D + pow(2.0D, match_weight))"
    narrow_prune = top_n is not None and not retain_bf and not attach_display
    if not narrow_prune:
        df = df.withColumn("match_probability", F.expr(prob_sql))
    if thr_eff is not None:
        df = df.filter(F.col("match_weight") > thr_eff)
    if narrow_prune:
        # NARROW the rows before the top-n window: the window's exchange
        # + sort otherwise move/copy the full compact payload (packed
        # histogram arrays, signatures — JFR showed UnsafeRow.copy inside
        # the window-group-limit as ~10% of stage CPU) for rows of which
        # only ~5% survive. Only (ids, weight) cross the exchange; the
        # probability is recomputed from the weight after the cut (same
        # expression — bit-identical), and every display/second-pass
        # column is re-attached from the cleaned sides by
        # attach_display_columns (which the linkage caller invokes after
        # further pruning). Disabled under retain_bf (the BF columns must
        # ride through) and attach_display (the re-attach there does not
        # cover the matching columns).
        df = df.select("unique_id_l", "unique_id_r", "match_weight")
    if top_n is not None:
        # Size the window's exchange by CORES, not bytes (same rationale
        # and same replace-not-add mechanics as the second pass's
        # per_pair repartition): the top-n window needs a hash exchange
        # on unique_id_r anyway, and AQE's byte-targeted coalescing sizes
        # this CPU-dense, byte-light stage to ~1 ragged wave (9-13 tasks
        # at 8 cores measured on the pass-1 write job). An explicit
        # partition count on the SAME key pre-empts that exchange — the
        # window reuses the partitioning — keeps ~3 balanced waves per
        # core at any width, and (under a checkpointer) fans the pass-1
        # artifact into core-count-derived files so the next pass's scan
        # parallelism follows too.
        par = 3 * df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(par, "unique_id_r")
        w = Window.partitionBy("unique_id_r").orderBy(
            F.desc("match_weight"), F.desc("unique_id_l")
        )
        df = (
            df.withColumn("__rn_w", F.row_number().over(w))
            .filter(F.col("__rn_w") <= top_n)
            .drop("__rn_w")
        )
    if narrow_prune:
        df = df.withColumn("match_probability", F.expr(prob_sql))
    df = df.drop(
        "__w_prefix", "__bf_pc", "__cet_known", "__ub", "__lb", "__lb_elig",
        "__rn_lb", "__l5", "__hist_pa_l", "__hist_pa_r", "__cet_pa_l",
        "__cet_pa_r", "__nt1_dg_l", "__nt1_dg_r",
        "__pc_area_l", "__pc_area_r", "__pc_in_l", "__pc_in_r",
    )
    if not retain_bf:
        df = df.drop(*[c for c in df.columns if c.startswith("bf_") or c.startswith("tf_numeric")])
    if attach_display:
        df = attach_display_columns(
            df, cleaned_l, cleaned_r, retain_matching_columns,
            broadcast_sides=bcast_sides,
        )
    return df


_CHEAP5 = [
    "bf_original_address_concat",
    "bf_flat_positional",
    "bf_numeric_token_1",
    "bf_numeric_token_2",
    "bf_numeric_token_3",
]


def _single_stage_kernel(df: DataFrame, bf_sqls: dict[str, str]) -> DataFrame:
    df = df.withColumns({name: F.expr(sql) for name, sql in bf_sqls.items()})

    log_sum = " + ".join(f"log2({name})" for name in bf_sqls)
    # Pin the weight projection: CollapseProject + PushDownPredicate would
    # otherwise inline the ENTIRE scoring expression tree into every
    # downstream consumer — the threshold filter (which lands in the join
    # condition), the match_weight output, and match_probability's two
    # references — evaluating all 8 BF cascades 4x per pair (measured: 4
    # copies of every comparison in the optimized plan). Adding
    # ``0.0 * rand(seed)`` leaves the value bit-identical (0.0 * r is
    # exactly 0.0 for r in [0,1)) but flags the column nondeterministic,
    # which Catalyst refuses to collapse through or push filters below, so
    # the kernel runs exactly once and consumers read the materialised
    # column. (A boolean guard like ``rand() >= -1`` does NOT survive:
    # Spark 4 folds out-of-range rand comparisons to literals.)
    return df.withColumn(
        "match_weight",
        F.expr(f"{X.d(PRIOR_LOG2_ODDS)} + {log_sum} + 0.0D * rand(7)"),
    )


def _two_stage_kernel(
    df: DataFrame,
    bf_sqls: dict[str, str],
    thr_eff: float,
    top_n: int | None,
    retain_bf: bool,
    debug_stage_counts: dict | None = None,
) -> DataFrame:
    """Branch-and-bound kernel: cheap comparisons + bounds, prune, then
    the expensive histogram/common-end products on survivors only. See
    score_pairs docstring for the bound derivation and soundness
    argument. Every intermediate is pinned (see _single_stage_kernel's
    comment on the 0.0*rand idiom) so each is computed exactly once per
    pair however many downstream consumers reference it."""
    # ---- stage 1: six cheap scalar comparisons + weight bounds ----
    if retain_bf:
        df = df.withColumns(
            {n: F.expr(X.pin(bf_sqls[n], 30 + i)) for i, n in enumerate(_CHEAP5)}
        )
        prefix_terms = [f"log2({n})" for n in _CHEAP5]
    else:
        prefix_terms = [f"log2({bf_sqls[n]})" for n in _CHEAP5]
    pc = "bf_postcode" if retain_bf else "__bf_pc"
    df = df.withColumn(pc, F.expr(X.pin(bf_sqls["bf_postcode"], 36)))
    # __w_prefix = prior + the first five log-BF terms in the ORIGINAL
    # summation order, so the final weight (prefix + hist + cet + pc) is
    # the bit-identical left-associated sum the single-stage kernel emits
    df = df.withColumn(
        "__w_prefix",
        F.expr(X.pin(f"{X.d(PRIOR_LOG2_ODDS)} + " + " + ".join(prefix_terms), 37)),
    )
    df = df.withColumn(
        "__cet_known",
        F.expr(
            X.pin(
                "CASE WHEN __ch_tok_l IS NULL "
                "OR __ch_tok_r IS NULL THEN 1.0D "
                f"WHEN greatest(__cet_pa_l, __cet_pa_r) >= {X.d(1e-2)} "
                f"THEN {X.d(1 / 1.5)} END",
                38,
            )
        ),
    )
    hist_null = "__th_tok_l IS NULL OR __th_tok_r IS NULL"
    hist_ub = (
        f"CASE WHEN {hist_null} THEN 1.0D ELSE "
        + X.let("greatest(__hist_pa_l, __hist_pa_r)", _bucket_sql)
        + " END"
    )
    hist_lb = f"CASE WHEN {hist_null} THEN 1.0D ELSE 0.5D END"
    eps = X.d(1e-9)
    df = df.withColumn(
        "__ub",
        F.expr(
            X.pin(
                f"__w_prefix + log2({hist_ub}) "
                f"+ log2(coalesce(__cet_known, 4.0D)) + log2({pc}) + {eps}",
                39,
            )
        ),
    )
    if debug_stage_counts is not None:
        # diagnostic only (extra jobs re-run the attach lineage): how much
        # of the blocked-pair volume each early-exit stage removes
        agg = df.agg(
            F.count("*").alias("n_input"),
            F.count(F.when(F.col("__ub") > thr_eff, 1)).alias("n_after_ub"),
        ).collect()[0]
        debug_stage_counts["n_input"] = agg["n_input"]
        debug_stage_counts["n_after_ub"] = agg["n_after_ub"]
    df = df.filter(F.col("__ub") > thr_eff)
    if top_n is not None:
        df = df.withColumn(
            "__lb",
            F.expr(
                X.pin(
                    f"__w_prefix + log2({hist_lb}) "
                    f"+ log2(coalesce(__cet_known, {X.d(1 / 1.5)})) "
                    f"+ log2({pc}) - {eps}",
                    40,
                )
            ),
        )
        # only pairs that provably survive the threshold may outrank
        df = df.withColumn(
            "__lb_elig", F.expr(f"CASE WHEN __lb > {X.d(thr_eff)} THEN __lb END")
        )
        grp = Window.partitionBy("unique_id_r")
        df = df.withColumn(
            "__rn_lb",
            F.row_number().over(grp.orderBy(F.desc_nulls_last("__lb_elig"))),
        )
        df = df.withColumn(
            "__l5",
            F.max(
                F.when(
                    (F.col("__rn_lb") == top_n) & F.col("__lb_elig").isNotNull(),
                    F.col("__lb_elig"),
                )
            ).over(grp),
        )
        # drop only when >= top_n group members have lower bounds STRICTLY
        # above this pair's upper bound (ties keep the pair — soundness)
        df = df.filter(F.col("__l5").isNull() | (F.col("__ub") >= F.col("__l5")))
        if debug_stage_counts is not None:
            debug_stage_counts["n_after_rank"] = df.count()

    # ---- stage 2: the expensive products, survivors only ----
    cet_sql = (
        "CASE WHEN __cet_known IS NOT NULL THEN __cet_known "
        f"ELSE {bf_sqls['bf_common_end_tokens']} END"
    )
    hist_sql = bf_sqls["bf_token_rel_freq_arr_hist"]
    if retain_bf:
        df = df.withColumn(
            "bf_token_rel_freq_arr_hist", F.expr(X.pin(hist_sql, 41))
        ).withColumn("bf_common_end_tokens", F.expr(X.pin(cet_sql, 42)))
        hist_term, cet_term = "bf_token_rel_freq_arr_hist", "bf_common_end_tokens"
    else:
        hist_term, cet_term = hist_sql, cet_sql
    return df.withColumn(
        "match_weight",
        F.expr(
            f"__w_prefix + log2({hist_term}) + log2({cet_term}) "
            f"+ log2({pc}) + 0.0D * rand(7)"
        ),
    )


def attach_display_columns(
    df: DataFrame,
    cleaned_l: DataFrame,
    cleaned_r: DataFrame,
    retain_matching_columns: bool = True,
    broadcast_sides: bool | None = None,
) -> DataFrame:
    """Re-attach the text/histogram columns the compact scored rows shed
    (see score_pairs._compact): two narrow joins against the cleaned
    tables. Call AFTER any filtering/pruning — at the linkage defaults,
    the rescoring candidates are ~5% of the scored pairs, so attaching
    late moves a fraction of the bytes that carrying display strings
    through the pair exchanges would.

    ``broadcast_sides``: None probes the same size gate as score_pairs
    (_sides_broadcastable); pass the already-computed decision to skip
    the two count jobs."""
    if broadcast_sides is None:
        broadcast_sides = _sides_broadcastable(cleaned_l, cleaned_r)
    df = df.drop(
        "__oac_sig_l", "__oac_sig_r",
        "token_rel_freq_arr_hist_l", "token_rel_freq_arr_hist_r",
        "common_end_tokens_hist_l", "common_end_tokens_hist_r",
        *[
            f"{p}_{part}_{s}"
            for p in ("__th", "__ch")
            for part in ("tok", "cnt", "rf")
            for s in ("l", "r")
        ],
    )

    def _reatt(side_df: DataFrame, suffix: str, wanted: list[str]):
        cols = [F.col("unique_id").alias(f"unique_id{suffix}")]
        for c in wanted:
            if c in side_df.columns:
                cols.append(F.col(c).alias(f"{c}{suffix}"))
        return side_df.select(cols)

    want_l = ["original_address_concat"]
    want_r = ["original_address_concat", "common_end_tokens_hist"]
    if retain_matching_columns:
        want_l += ["common_end_tokens_hist", "token_rel_freq_arr_hist"]
        want_r += ["token_rel_freq_arr_hist"]
    # rows from score_pairs's narrow prune path carry only
    # (ids, weight, probability) — re-attach whatever the output
    # contract needs that the rows no longer have
    if "postcode_l" not in df.columns:
        want_l += ["postcode"]
    if "postcode_r" not in df.columns:
        want_r += ["postcode"]
    if retain_matching_columns:
        for c in ("numeric_token_1", "numeric_token_2", "numeric_token_3",
                  "flat_positional", "flat_letter"):
            if f"{c}_l" not in df.columns:
                want_l.append(c)
            if f"{c}_r" not in df.columns:
                want_r.append(c)
    if broadcast_sides:
        df = df.join(
            F.broadcast(_reatt(cleaned_l, "_l", want_l)), "unique_id_l"
        ).join(F.broadcast(_reatt(cleaned_r, "_r", want_r)), "unique_id_r")
    else:
        df = df.join(
            _reatt(cleaned_l, "_l", want_l).hint("shuffle_hash"), "unique_id_l"
        ).join(_reatt(cleaned_r, "_r", want_r).hint("shuffle_hash"), "unique_id_r")

    if not retain_matching_columns:
        keep = {
            "unique_id_l",
            "unique_id_r",
            "match_weight",
            "match_probability",
            "original_address_concat_l",
            "original_address_concat_r",
            "postcode_l",
            "postcode_r",
            "common_end_tokens_hist_r",
        }
        df = df.select(*[c for c in df.columns if c in keep])
    return df


def predict(
    cleaned_l: DataFrame,
    cleaned_r: DataFrame,
    numeric_tf: DataFrame | None = None,
    rules=None,
    salt: int = 1,
    threshold_match_weight: float | None = None,
    retain_bf: bool = False,
) -> DataFrame:
    """block + score — the reference's linker.inference.predict equivalent."""
    from uk_address_matcher_spark.blocking import block

    pairs = block(cleaned_l, cleaned_r, rules=rules, salt=salt)
    return score_pairs(
        pairs,
        cleaned_l,
        cleaned_r,
        numeric_tf,
        threshold_match_weight=threshold_match_weight,
        retain_bf=retain_bf,
    )
