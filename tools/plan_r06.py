"""Dump .explain('formatted') for the round-6 touched queries.

Usage: python tools/plan_r06.py <suffix> [outdir]
Writes <outdir>/<query>_<suffix>.txt for each captured query. Run once
from the round-start tree (suffix 'before') and once from the optimized
tree (suffix 'after'). Planning only — no jobs execute except the tiny
count() feeding LSH n_planes derivation.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from uk_address_matcher_spark.session import get_spark

    spark = get_spark(app_name="plan_r06", master="local[4]", shuffle_partitions=8)

    captured = [
        "q_knn_bruteforce",
        "q_knn_lsh",
        "q_embedding_neardup",
        "q_embedding_neardup_capped",
    ]
    qs = E.queries()
    for name in captured:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan_of(df))
        print(f"wrote {name}_{suffix}.txt")

    # flagship pass-1 (block + score + fused prune, compact path) at a
    # tiny corpus — the plan shape is scale-independent
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_documents,
    )
    from uk_address_matcher_spark.extract import extract_addresses
    from uk_address_matcher_spark.linkage import build_side_tables
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.blocking import block
    from uk_address_matcher_spark.scoring import score_pairs
    from uk_address_matcher_spark.second_pass import (
        PRUNE_MATCH_WEIGHT_THRESHOLD,
        PRUNE_TOP_N,
    )

    canon_docs, messy_docs, _ = grid_documents(spark, 2000, dup_factor=1)
    canon = extract_addresses(canon_docs).cache()
    messy = extract_addresses(messy_docs).cache()
    canon.count(), messy.count()
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    cl.count(), cr.count()
    pred = score_pairs(
        block(cl, cr),
        cl,
        cr,
        side.numeric_tf,
        threshold_match_weight=-50.0,
        retain_matching_columns=False,
        attach_display=False,
        prune_top_n=(PRUNE_MATCH_WEIGHT_THRESHOLD, PRUNE_TOP_N),
    )
    with open(os.path.join(outdir, f"addr_link_pass1_{suffix}.txt"), "w") as f:
        f.write(plan_of(pred))
    print(f"wrote addr_link_pass1_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
