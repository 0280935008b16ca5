"""Measure how much the B&B two-stage kernel's bounds actually cut, per
corpus shape — the cheap precursor to a full ab_link A/B.

Runs score_pairs(early_exit=True, debug_stage_counts=...) over (a) the
standard grid corpus and (b) the postcode-skewed junk-heavy variant, and
prints n_input / n_after_ub / n_after_rank for each: the fraction of
blocked pairs the upper-bound filter and the rank bound remove. If
neither cut is structural (>~40%), the two-stage kernel cannot win —
the bound columns + extra per-group sort cost ~15% wall (round-5 A/B).

Usage: python tools/bnb_probe.py [n_canonical=30000] [cpus=16]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(skew: bool, n: int, cpus: int) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from uk_address_matcher_spark.blocking import block
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_documents,
        skew_postcodes,
    )
    from uk_address_matcher_spark.extract import extract_addresses
    from uk_address_matcher_spark.linkage import build_side_tables
    from uk_address_matcher_spark.scoring import score_pairs
    from uk_address_matcher_spark.second_pass import (
        PRUNE_MATCH_WEIGHT_THRESHOLD,
        PRUNE_TOP_N,
    )
    from uk_address_matcher_spark.session import get_spark

    spark = get_spark(
        app_name=f"bnb_probe_{'skew' if skew else 'grid'}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    canon_docs, messy_docs, _ = grid_documents(spark, n, dup_factor=1)
    canon = extract_addresses(canon_docs)
    messy = extract_addresses(messy_docs)
    if skew:
        canon = skew_postcodes(canon, n_hot=50, hot_share=0.5)
        messy = skew_postcodes(messy, n_hot=50, hot_share=0.5)
    canon = canon.cache()
    messy = messy.cache()
    canon.count(), messy.count()
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    cl.count(), cr.count()
    counts: dict = {}
    pred = score_pairs(
        block(cl, cr),
        cl,
        cr,
        side.numeric_tf,
        threshold_match_weight=-50.0,
        retain_matching_columns=False,
        attach_display=False,
        prune_top_n=(PRUNE_MATCH_WEIGHT_THRESHOLD, PRUNE_TOP_N),
        early_exit=True,
        debug_stage_counts=counts,
    )
    n_out = pred.count()
    counts["n_output"] = n_out
    counts["corpus"] = "skew" if skew else "grid"
    counts["ub_cut_pct"] = round(
        100.0 * (1 - counts["n_after_ub"] / counts["n_input"]), 2
    )
    if "n_after_rank" in counts:
        counts["rank_cut_pct"] = round(
            100.0 * (1 - counts["n_after_rank"] / counts["n_after_ub"]), 2
        )
    spark.stop()
    return counts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"grid": probe(False, n, cpus), "skew": probe(True, n, cpus)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
