"""Branch-and-bound scoring kernel: exact equivalence to the
single-stage kernel (same pairs, bit-identical weights) under threshold
and threshold+top-n pruning — the soundness contract of the early exit."""

import pytest
from pyspark.sql import functions as F

from uk_address_matcher_spark.blocking import block
from uk_address_matcher_spark.cleaning import clean_addresses
from uk_address_matcher_spark.corpus import domain_token_frequencies, grid_documents
from uk_address_matcher_spark.extract import extract_addresses
from uk_address_matcher_spark.linkage import build_side_tables
from uk_address_matcher_spark.scoring import score_pairs
from uk_address_matcher_spark.second_pass import prune_candidates


@pytest.fixture(scope="module")
def scoring_inputs(spark):
    canon_docs, messy_docs, _ = grid_documents(spark, 3000, dup_factor=1)
    canon = extract_addresses(canon_docs)
    messy = extract_addresses(messy_docs)
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    cl.count(), cr.count()
    pairs = block(cl, cr).cache()
    pairs.count()
    return pairs, cl, cr, side.numeric_tf


def _rows(df):
    return sorted(
        (r["unique_id_l"], r["unique_id_r"], r["match_weight"], r["match_probability"])
        for r in df.select(
            "unique_id_l", "unique_id_r", "match_weight", "match_probability"
        ).collect()
    )


def test_bnb_equals_single_stage_with_prune(spark, scoring_inputs):
    pairs, cl, cr, ntf = scoring_inputs
    ref = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False,
        prune_top_n=(-20.0, 5), early_exit=False,
    )
    bnb = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False,
        prune_top_n=(-20.0, 5), early_exit=True,
    )
    r, b = _rows(ref), _rows(bnb)
    assert len(r) > 0
    assert r == b  # same pair set AND bit-identical weights/probabilities


def test_bnb_equals_single_stage_threshold_only(spark, scoring_inputs):
    pairs, cl, cr, ntf = scoring_inputs
    ref = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False, early_exit=False,
    )
    bnb = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False, early_exit=True,
    )
    assert _rows(ref) == _rows(bnb)


def test_fused_prune_matches_external_prune(spark, scoring_inputs):
    """prune_top_n must be exactly prune_candidates applied to the full
    scored output (the contract linkage relies on)."""
    pairs, cl, cr, ntf = scoring_inputs
    full = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False, early_exit=False,
    )
    pruned_ext = prune_candidates(full, -20.0, 5)
    fused = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False,
        prune_top_n=(-20.0, 5), early_exit=True,
    )
    assert _rows(pruned_ext) == _rows(fused)


def test_bnb_retain_bf_columns(spark, scoring_inputs):
    """retain_bf under the two-stage kernel: all 8 BF columns present and
    value-identical to the single-stage kernel's."""
    pairs, cl, cr, ntf = scoring_inputs
    cols = [
        "unique_id_l", "unique_id_r",
        "bf_original_address_concat", "bf_flat_positional",
        "bf_numeric_token_1", "bf_numeric_token_2", "bf_numeric_token_3",
        "bf_token_rel_freq_arr_hist", "bf_common_end_tokens", "bf_postcode",
    ]
    ref = score_pairs(
        pairs, cl, cr, ntf, threshold_match_weight=-20.0,
        retain_bf=True, attach_display=False, early_exit=False,
    )
    bnb = score_pairs(
        pairs, cl, cr, ntf, threshold_match_weight=-20.0,
        retain_bf=True, attach_display=False, early_exit=True,
    )
    r = sorted(tuple(row[c] for c in cols) for row in ref.select(cols).collect())
    b = sorted(tuple(row[c] for c in cols) for row in bnb.select(cols).collect())
    assert r == b


def test_bnb_prunes_histogram_work(spark, scoring_inputs):
    """The early exit must actually cut work: stage-2 input (pairs whose
    bounds survive) must be well under the blocked-pair count."""
    pairs, cl, cr, ntf = scoring_inputs
    n_pairs = pairs.count()
    fused = score_pairs(
        pairs, cl, cr, ntf,
        threshold_match_weight=-50.0, attach_display=False,
        prune_top_n=(-20.0, 5), early_exit=True,
    )
    n_out = fused.count()
    assert 0 < n_out < n_pairs
