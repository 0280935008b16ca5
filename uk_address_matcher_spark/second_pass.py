"""Second-pass rescoring via distinguishing tokens and bigrams.

Re-expression of the reference's
post_linkage/identify_distinguishing_tokens.py:4-443 (7 relational steps;
tuning constants at lines 4-17). Sides follow the reference: l =
canonical candidate, r = messy record.

Spark plan shape: filter -> window top-k (one shuffle on unique_id_r) ->
groupBy(unique_id_r) block aggregates (same key: no extra exchange under
AQE) -> join aggregates back (same key) -> map algebra in one projection.
Everything after the top-k is partition-local in unique_id_r.

Representation choices vs the reference:
 - bigrams are 'TOK1 TOK2' strings, not LIST<VARCHAR> map keys (Spark map
   keys hash poorly for arrays; tokens contain no spaces so the string is
   lossless)
 - histograms are map<string, long> built by expression over the (small)
   per-block arrays
 - block token pools are collected as struct(unique_id_l, tokens) and
   array_sort'ed so the flattened order — and hence the cross-candidate
   bigram artifacts the reference also has — is DETERMINISTIC (DuckDB's
   array_agg order is accidental; collect_list order is too, so we pin it)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from uk_address_matcher_spark.cleaning.steps import let

REWARD_MULTIPLIER = 3.0
PUNISHMENT_MULTIPLIER = 1.5
BIGRAM_REWARD_MULTIPLIER = 3.0
BIGRAM_PUNISHMENT_MULTIPLIER = 1.5
MISSING_TOKEN_PENALTY = 0.1


def _tokenise(addr: Column, pc: Column) -> Column:
    return F.split(F.upper(F.trim(F.concat_ws(" ", addr, pc))), r"\s+")


def _strip_common_end(addr: Column, common_end: Column) -> Column:
    """Drop up to TWO trailing tokens that appear in the messy record's
    common-end set (identify_distinguishing_tokens.py:59-88: double
    list_filter over the reversed token list)."""

    def strip_once(arr: Column) -> Column:
        return F.when(
            (F.size(arr) > 0)
            & F.array_contains(common_end, F.try_element_at(arr, F.lit(-1))),
            F.slice(arr, 1, F.size(arr) - 1),
        ).otherwise(arr)

    toks = F.split(F.upper(F.trim(addr)), r"\s+")
    return F.array_join(let(toks, lambda t: strip_once(strip_once(t))), " ")


def _bigrams(tokens: Column) -> Column:
    # zip-of-shifted-slices (identify_distinguishing_tokens.py:140-146) as
    # 'A B' strings; empty when fewer than 2 tokens
    return F.when(
        F.size(tokens) >= 2,
        F.zip_with(
            F.slice(tokens, 1, F.size(tokens) - 1),
            F.slice(tokens, 2, F.size(tokens) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _hist(arr: Column) -> Column:
    """array<string> -> map<string, long> multiset counts (NULL if empty,
    matching DuckDB list_aggregate 'histogram')."""

    def h(a: Column) -> Column:
        m = F.map_from_entries(
            F.transform(
                F.array_distinct(a),
                lambda t: F.struct(
                    t.alias("key"),
                    F.size(F.filter(a, lambda y: y == t)).cast("long").alias("value"),
                ),
            )
        )
        return F.when(F.size(a) > 0, m)

    return let(arr, h)


def _filter_map_keys(m: Column, keys: Column) -> Column:
    return F.map_from_entries(
        F.filter(F.map_entries(m), lambda e: F.array_contains(keys, e["key"]))
    )


def _map_sum_inv_sq(m: Column) -> Column:
    # sum over map values of 1/v^2 (the reward kernel,
    # identify_distinguishing_tokens.py:384-387); 0 for empty/null maps
    return F.coalesce(
        F.aggregate(
            F.map_values(m),
            F.lit(0.0),
            lambda acc, v: acc + F.lit(1.0) / (v.cast("double") * v.cast("double")),
        ),
        F.lit(0.0),
    )


def improve_predictions_using_distinguishing_tokens(
    df_predict: DataFrame,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
) -> DataFrame:
    # Step 1-2: threshold + top-n per messy record (DESC weight, DESC id)
    good = df_predict.filter(F.col("match_weight") > match_weight_threshold)
    w = Window.partitionBy("unique_id_r").orderBy(
        F.desc("match_weight"), F.desc("unique_id_l")
    )
    top = good.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= top_n_matches
    ).drop("__rn")

    # Step 3: strip up to 2 common end tokens (from the messy side's set).
    # EFFECTIVE reference behaviour: only tokens_r sees the stripped text —
    # the reference's step 4 (tokenise_r) reads FROM remove_common_end_tokens,
    # but steps 5 and 6 read FROM top_n_matches, so tokens_l /
    # tokens_in_block_l and the output original_address_concat_* are all
    # built from the UN-stripped l side
    # (identify_distinguishing_tokens.py:86-270).
    common_end = F.coalesce(
        F.transform(F.col("common_end_tokens_hist_r"), lambda e: e["tok"]),
        F.array().cast("array<string>"),
    )
    top = top.withColumn("__cet_r", common_end).withColumn(
        "addr_r_stripped",
        _strip_common_end(F.col("original_address_concat_r"), F.col("__cet_r")),
    )

    # Step 4-5: per-block aggregates keyed by unique_id_r
    per_pair = top.select(
        "unique_id_r",
        "unique_id_l",
        "match_weight",
        "match_probability",
        F.col("original_address_concat_l"),
        F.col("original_address_concat_r"),
        F.col("postcode_l"),
        F.col("postcode_r"),
        _tokenise(F.col("original_address_concat_l"), F.col("postcode_l")).alias("tokens_l"),
        _tokenise(F.col("addr_r_stripped"), F.col("postcode_r")).alias("tokens_r"),
    ).cache()  # feeds both the block-aggregate branch and the pair join

    block_aggs = (
        per_pair.groupBy("unique_id_r")
        .agg(
            F.first("tokens_r").alias("tokens_r"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("unique_id_l", "tokens_l"))
                    ),
                    lambda s: s["tokens_l"],
                )
            ).alias("tokens_in_block_l"),
        )
        .select(
            "unique_id_r",
            "tokens_r",
            _hist(F.col("tokens_in_block_l")).alias("hist_all_tokens_in_block_l"),
            _hist(_bigrams(F.col("tokens_in_block_l"))).alias(
                "hist_all_bigrams_in_block_l"
            ),
            _bigrams(F.col("tokens_r")).alias("bigrams_r"),
        )
        .select(
            "unique_id_r",
            "tokens_r",
            "bigrams_r",
            "hist_all_tokens_in_block_l",
            "hist_all_bigrams_in_block_l",
            _filter_map_keys(
                F.col("hist_all_tokens_in_block_l"), F.col("tokens_r")
            ).alias("hist_overlapping_tokens_r_block_l"),
            _filter_map_keys(
                F.col("hist_all_bigrams_in_block_l"), F.col("bigrams_r")
            ).alias("hist_overlapping_bigrams_r_block_l"),
        )
    )

    # Step 6: per-pair intermediates
    df = per_pair.drop("tokens_r").join(block_aggs, "unique_id_r")
    df = df.withColumn("bigrams_l", _bigrams(F.col("tokens_l")))
    df = (
        df.withColumn(
            "overlapping_tokens_this_l_and_r",
            _filter_map_keys(
                F.col("hist_overlapping_tokens_r_block_l"), F.col("tokens_l")
            ),
        )
        .withColumn(
            "tokens_r_not_in_l",
            F.filter(
                F.col("tokens_r"),
                lambda t: ~F.array_contains(F.col("tokens_l"), t),
            ),
        )
        .withColumn(
            "missing_tokens",
            F.filter(
                F.col("tokens_l"),
                lambda t: ~F.array_contains(F.col("tokens_r"), t),
            ),
        )
        .withColumn(
            "overlapping_bigrams_this_l_and_r",
            _filter_map_keys(
                F.col("hist_overlapping_bigrams_r_block_l"), F.col("bigrams_l")
            ),
        )
        .withColumn(
            "bigrams_r_not_in_l",
            F.filter(
                F.col("bigrams_r"),
                lambda b: ~F.array_contains(F.col("bigrams_l"), b),
            ),
        )
    )

    # Step 7: elsewhere-in-block maps + unigram-explained bigram filtering
    df = df.withColumn(
        "tokens_elsewhere_in_block_but_not_this",
        _filter_map_keys(F.col("hist_all_tokens_in_block_l"), F.col("tokens_r_not_in_l")),
    ).withColumn(
        "bigrams_elsewhere_in_block_but_not_this",
        _filter_map_keys(F.col("hist_all_bigrams_in_block_l"), F.col("bigrams_r_not_in_l")),
    )

    def bigram_not_explained(unigram_map: Column):
        # keep bigram entries NOT already explained by both unigram counts
        # (identify_distinguishing_tokens.py:328-361)
        def pred(e):
            t1 = F.split_part(e["key"], F.lit(" "), F.lit(1))
            t2 = F.split_part(e["key"], F.lit(" "), F.lit(2))
            l1 = F.try_element_at(unigram_map, t1)
            l2 = F.try_element_at(unigram_map, t2)
            explained = (
                l1.isNotNull() & (l1 <= e["value"]) & l2.isNotNull() & (l2 <= e["value"])
            )
            return ~explained

        return pred

    df = df.withColumn(
        "overlapping_bigrams_this_l_and_r_filtered",
        F.map_from_entries(
            F.filter(
                F.map_entries(F.col("overlapping_bigrams_this_l_and_r")),
                bigram_not_explained(F.col("overlapping_tokens_this_l_and_r")),
            )
        ),
    ).withColumn(
        "bigrams_elsewhere_in_block_but_not_this_filtered",
        F.map_from_entries(
            F.filter(
                F.map_entries(F.col("bigrams_elsewhere_in_block_but_not_this")),
                bigram_not_explained(F.col("tokens_elsewhere_in_block_but_not_this")),
            )
        ),
    )

    # Step 8: adjusted weight (identify_distinguishing_tokens.py:376-441)
    adj = (
        _map_sum_inv_sq(F.col("overlapping_tokens_this_l_and_r")) * REWARD_MULTIPLIER
        - F.size(F.map_keys(F.col("tokens_elsewhere_in_block_but_not_this")))
        * PUNISHMENT_MULTIPLIER
        - F.size(F.col("missing_tokens")) * MISSING_TOKEN_PENALTY
    )
    if use_bigrams:
        adj = (
            adj
            + _map_sum_inv_sq(F.col("overlapping_bigrams_this_l_and_r_filtered"))
            * BIGRAM_REWARD_MULTIPLIER
            - F.size(F.map_keys(F.col("bigrams_elsewhere_in_block_but_not_this_filtered")))
            * BIGRAM_PUNISHMENT_MULTIPLIER
        )

    return (
        df.withColumn("mw_adjustment", adj)
        .withColumnRenamed("match_weight", "match_weight_original")
        .withColumn(
            "match_weight", F.col("match_weight_original") + F.col("mw_adjustment")
        )
        .drop("tokens_l", "tokens_r", "bigrams_l", "bigrams_r", "tokens_r_not_in_l", "bigrams_r_not_in_l")
    )
