"""Headline metric gate: pairwise F1 >= 0.99 on the labeled volume corpus
(BASELINE.json target) with the full 18-rule blocking and the domain TF
table — the reference's precomputed-TF path."""

import pytest
from pyspark.sql import functions as F

from uk_address_matcher_spark.corpus import domain_token_frequencies, grid_documents
from uk_address_matcher_spark.evaluate import pairwise_f1
from uk_address_matcher_spark.extract import extract_addresses
from uk_address_matcher_spark.linkage import build_side_tables, link_addresses


@pytest.fixture(scope="module")
def grid_run(spark):
    canon_docs, messy_docs, labels = grid_documents(spark, 3000, dup_factor=1)
    canon = extract_addresses(canon_docs).cache()
    messy = extract_addresses(messy_docs).cache()
    side = build_side_tables(
        spark, canon, rel_tok_freq=domain_token_frequencies(spark)
    )
    improved = link_addresses(canon, messy, side).cache()
    return labels, improved


def test_pairwise_f1_meets_target(spark, grid_run):
    labels, improved = grid_run
    res = pairwise_f1(labels, improved)
    assert res["precision"] >= 0.99, res
    assert res["f1"] >= 0.99, res


def test_salted_blocking_same_result(spark, grid_run):
    # explicit salting must not change the candidate-pair set
    from uk_address_matcher_spark.blocking import block
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.corpus import domain_token_frequencies

    canon_docs, messy_docs, _ = grid_documents(spark, 1000, dup_factor=1)
    canon = extract_addresses(canon_docs)
    messy = extract_addresses(messy_docs)
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    plain = block(cl, cr)
    salted = block(cl, cr, salt=4)
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_salted_blocking_same_result_under_zipf_skew(spark):
    """Salting must be a pure physical-layout change even on the worst
    case it exists for: a Zipf-skewed corpus where 10% of rows share a
    handful of postcodes (hot keys hit blocking rule 18 quadratically)."""
    from uk_address_matcher_spark.blocking import block
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_canonical_flat,
        messy_from_canonical,
        skew_postcodes,
    )

    canon = skew_postcodes(
        grid_canonical_flat(spark, 2000), n_hot=5, hot_share=0.10
    )
    messy, _ = messy_from_canonical(canon, dup_factor=1)
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    # skew really present: the biggest postcode block dwarfs the median
    sizes = sorted(
        r["n"] for r in cl.groupBy("postcode").agg(F.count("*").alias("n")).collect()
    )
    assert sizes[-1] >= 20 * sizes[len(sizes) // 2], sizes[-5:]
    plain = block(cl, cr)
    salted = block(cl, cr, salt=8)
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
