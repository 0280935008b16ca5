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

from uk_address_matcher_spark.cleaning.steps import let, pin

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


def prune_candidates(
    df_predict: DataFrame,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
) -> DataFrame:
    """Steps 1-2 of the rescoring pass: threshold + top-n per messy record
    (DESC weight, DESC id). Exposed separately so the linkage driver can
    prune the scored pairs BEFORE display columns are attached and the
    pass-1 checkpoint is written — everything below the threshold / rank
    cut is unreachable by the second pass, so carrying it through the
    re-attach joins and the durable checkpoint is pure waste (at 1M docs:
    45.8M scored rows of which ~2.5M are rescoring candidates).
    Idempotent: applying it to already-pruned input is a no-op.
    """
    good = df_predict.filter(F.col("match_weight") > match_weight_threshold)
    w = Window.partitionBy("unique_id_r").orderBy(
        F.desc("match_weight"), F.desc("unique_id_l")
    )
    return (
        good.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n_matches)
        .drop("__rn")
    )


def improve_predictions_using_distinguishing_tokens(
    df_predict: DataFrame,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
) -> DataFrame:
    # Step 1-2: threshold + top-n per messy record
    top = prune_candidates(df_predict, match_weight_threshold, top_n_matches)

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

    # Step 4-5: per-block aggregates keyed by unique_id_r. The block
    # histograms are computed ONCE PER BLOCK in the groupBy branch (a
    # window formulation would recompute them once per member row —
    # measured as the second-heaviest CPU stage in the pipeline and the
    # worst memory-bandwidth inflator at high parallelism). per_pair is
    # cached AND materialised (count) before fan-out: its two consumers
    # (the groupBy branch and the join-back) would otherwise race to fill
    # the cache inside one job, each recomputing the whole upstream
    # scoring pipeline. The groupBy and join share the top-n window's
    # unique_id_r hash partitioning, so neither adds an exchange.
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
    ).cache()
    per_pair.count()

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
            pin(_hist(F.col("tokens_in_block_l")), 11).alias(
                "hist_all_tokens_in_block_l"
            ),
            pin(_hist(_bigrams(F.col("tokens_in_block_l"))), 12).alias(
                "hist_all_bigrams_in_block_l"
            ),
            pin(_bigrams(F.col("tokens_r")), 20).alias("bigrams_r"),
            "tokens_r",
        )
        .select(
            "unique_id_r",
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
    df = per_pair.join(block_aggs, "unique_id_r")

    # Step 6: per-pair intermediates. Every map/array column below is
    # consumed by several later expressions — some inside HOF lambdas,
    # where an inlined definition would re-evaluate per ELEMENT — so each
    # is pinned (computed once per row, referenced thereafter).
    df = df.withColumn("bigrams_l", pin(_bigrams(F.col("tokens_l")), 21))
    df = (
        df.withColumn(
            "overlapping_tokens_this_l_and_r",
            pin(
                _filter_map_keys(
                    F.col("hist_overlapping_tokens_r_block_l"), F.col("tokens_l")
                ),
                13,
            ),
        )
        .withColumn(
            "tokens_r_not_in_l",
            pin(
                F.filter(
                    F.col("tokens_r"),
                    lambda t: ~F.array_contains(F.col("tokens_l"), t),
                ),
                22,
            ),
        )
        .withColumn(
            "missing_tokens",
            pin(
                F.filter(
                    F.col("tokens_l"),
                    lambda t: ~F.array_contains(F.col("tokens_r"), t),
                ),
                23,
            ),
        )
        .withColumn(
            "overlapping_bigrams_this_l_and_r",
            pin(
                _filter_map_keys(
                    F.col("hist_overlapping_bigrams_r_block_l"), F.col("bigrams_l")
                ),
                15,
            ),
        )
        .withColumn(
            "bigrams_r_not_in_l",
            pin(
                F.filter(
                    F.col("bigrams_r"),
                    lambda b: ~F.array_contains(F.col("bigrams_l"), b),
                ),
                24,
            ),
        )
    )

    # Step 7: elsewhere-in-block maps + unigram-explained bigram filtering
    df = df.withColumn(
        "tokens_elsewhere_in_block_but_not_this",
        pin(
            _filter_map_keys(
                F.col("hist_all_tokens_in_block_l"), F.col("tokens_r_not_in_l")
            ),
            14,
        ),
    ).withColumn(
        "bigrams_elsewhere_in_block_but_not_this",
        pin(
            _filter_map_keys(
                F.col("hist_all_bigrams_in_block_l"), F.col("bigrams_r_not_in_l")
            ),
            16,
        ),
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
        pin(
            F.map_from_entries(
                F.filter(
                    F.map_entries(F.col("overlapping_bigrams_this_l_and_r")),
                    bigram_not_explained(F.col("overlapping_tokens_this_l_and_r")),
                )
            ),
            17,
        ),
    ).withColumn(
        "bigrams_elsewhere_in_block_but_not_this_filtered",
        pin(
            F.map_from_entries(
                F.filter(
                    F.map_entries(F.col("bigrams_elsewhere_in_block_but_not_this")),
                    bigram_not_explained(F.col("tokens_elsewhere_in_block_but_not_this")),
                )
            ),
            18,
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
        df.withColumn("mw_adjustment", pin(adj, 19))
        .withColumnRenamed("match_weight", "match_weight_original")
        .withColumn(
            "match_weight", F.col("match_weight_original") + F.col("mw_adjustment")
        )
        .drop("tokens_l", "tokens_r", "bigrams_l", "bigrams_r", "tokens_r_not_in_l", "bigrams_r_not_in_l")
    )
