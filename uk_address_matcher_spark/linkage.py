"""High-level linkage driver: side tables + clean + block + score + rescore.

The side tables (token TF, numeric TF, common end tokens) are tiny (at
most a few hundred thousand rows); they are materialised to the driver
once and re-created as local DataFrames so their (full-cleaning-queue)
plans are never re-executed by downstream broadcast joins — without this,
every broadcast re-runs the generating pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from uk_address_matcher_spark.blocking import block
from uk_address_matcher_spark.cleaning import (
    clean_addresses,
    get_address_token_frequencies,
    get_common_end_tokens,
    get_numeric_term_frequencies,
)
from uk_address_matcher_spark.scoring import score_pairs
from uk_address_matcher_spark.second_pass import (
    improve_predictions_using_distinguishing_tokens,
)


@dataclass
class SideTables:
    rel_tok_freq: DataFrame  # (token, rel_freq)
    numeric_tf: DataFrame  # (numeric_token, tf_numeric_token)
    common_end_tokens: list[str]


def build_side_tables(
    spark: SparkSession,
    corpus_flat: DataFrame,
    common_end_min_share: float = 0.01,
    rel_tok_freq: DataFrame | None = None,
) -> SideTables:
    """``rel_tok_freq`` (precomputed domain TF, e.g.
    corpus.domain_token_frequencies) mirrors the reference's
    clean_data_using_precomputed_rel_tok_freq path; when None, TF is
    computed from the corpus itself (clean_data_on_the_fly path)."""
    if rel_tok_freq is None:
        tf_rows = get_address_token_frequencies(corpus_flat).collect()
        tf = spark.createDataFrame(tf_rows, "token string, rel_freq double")
    else:
        tf = spark.createDataFrame(
            rel_tok_freq.collect(), "token string, rel_freq double"
        )
    ntf_rows = get_numeric_term_frequencies(corpus_flat).collect()
    cet = get_common_end_tokens(corpus_flat, min_share=common_end_min_share)
    ntf = spark.createDataFrame(ntf_rows, "numeric_token string, tf_numeric_token double")
    return SideTables(rel_tok_freq=tf, numeric_tf=ntf, common_end_tokens=cet)


def link_addresses(
    canonical_flat: DataFrame,
    messy_flat: DataFrame,
    side: SideTables,
    rules=None,
    salt: int = 1,
    threshold_match_weight: float = -50.0,
    second_pass: bool = True,
    checkpointer=None,
) -> DataFrame:
    """Full two-pass linkage. ``checkpointer`` (optional,
    checkpoint.CheckpointManager) persists each pass for lineage/resume.

    source_dataset contract (reference splink_model.py:38-46 +
    tests/test_source_dataset.py:74-87): inputs must NOT carry a
    ``source_dataset`` column (raises ValueError), and every output pair
    carries ``source_dataset_l = 'c_'`` / ``source_dataset_r = 'm_'``
    regardless of where the rows came from."""
    for name, frame in (("canonical", canonical_flat), ("messy", messy_flat)):
        if "source_dataset" in frame.columns:
            raise ValueError(
                f"{name} input contains a 'source_dataset' column. Remove it "
                "before calling link_addresses: the linker overwrites it "
                "with its own 'c_'/'m_' tags."
            )
    cl = clean_addresses(canonical_flat, side.rel_tok_freq, side.common_end_tokens)
    cr = clean_addresses(messy_flat, side.rel_tok_freq, side.common_end_tokens)
    if checkpointer is not None:
        cl = checkpointer.checkpoint(cl, "cleaned_canonical")
        cr = checkpointer.checkpoint(cr, "cleaned_messy")
    else:
        # the cleaned tables feed several DAG branches (blocking keys l/r,
        # score attach l/r); without a materialisation barrier each branch
        # re-runs the whole cleaning pipeline — the reference needed DuckDB
        # temp tables here for the same reason (cleaning_pipelines.py:85-94)
        cl = cl.cache()
        cr = cr.cache()
    pairs = block(cl, cr, rules=rules, salt=salt)
    if checkpointer is not None:
        pairs = checkpointer.checkpoint(pairs, "blocked_pairs")
    # when the second pass consumes the predictions, drop the compared
    # attribute columns from pass 1 (the second pass re-derives its
    # features from the address strings; the histogram maps would
    # dominate the checkpoint encode) — the user-facing single-pass
    # output keeps them, like the reference's retain_matching_columns
    pred = score_pairs(
        pairs,
        cl,
        cr,
        side.numeric_tf,
        threshold_match_weight=threshold_match_weight,
        retain_matching_columns=not second_pass,
    )
    if checkpointer is not None:
        pred = checkpointer.checkpoint(pred, "predictions_pass1")
    elif second_pass:
        pred = pred.cache()  # consumed by 3 branches of the second pass
    if not second_pass:
        return _tag_source_datasets(pred)
    improved = improve_predictions_using_distinguishing_tokens(pred)
    if checkpointer is not None:
        improved = checkpointer.checkpoint(improved, "predictions_pass2")
    return _tag_source_datasets(improved)


def _tag_source_datasets(pred: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return pred.withColumn("source_dataset_l", F.lit("c_")).withColumn(
        "source_dataset_r", F.lit("m_")
    )
