"""Candidate-volume evidence for the corpus street-model fix.

Round-4 finding: the 'global' street model's power law let the hottest
street grow ~n^0.6, making blocked candidate pairs SUPERLINEAR in corpus
size (37 pairs/doc at 100k docs -> 145 at 1M) — so per-doc throughput and
scaling numbers at different corpus sizes measured the corpus, not the
engine. The 'sharded' model bounds street sizes (bit-identical corpus for
n <= 50k canonical).

This tool records the side-by-side: pairs/doc for BOTH street models at
BOTH scales, same blocking code. Counts are deterministic (not timing-
sensitive). Acceptance (VERDICT r4 item 2): sharded pairs/doc within
~1.5x between 100k and 1M total docs.

Usage: python tools/corpus_pairs.py [out_json=/tmp/corpus_pairs.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_canonical: int, street_model: str) -> dict:
    from uk_address_matcher_spark.blocking import block
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_documents,
    )
    from uk_address_matcher_spark.extract import extract_addresses
    from uk_address_matcher_spark.linkage import build_side_tables
    from uk_address_matcher_spark.session import get_spark

    spark = get_spark(
        app_name=f"uam_pairs_{street_model}_{n_canonical}",
        master="local[32]",
        shuffle_partitions=64,
    )
    canon_docs, messy_docs, _ = grid_documents(
        spark, n_canonical, dup_factor=1, street_model=street_model
    )
    canon = extract_addresses(canon_docs).cache()
    messy = extract_addresses(messy_docs).cache()
    n_docs = canon.count() + messy.count()
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
    cl = clean_addresses(canon, side.rel_tok_freq, side.common_end_tokens).cache()
    cr = clean_addresses(messy, side.rel_tok_freq, side.common_end_tokens).cache()
    cl.count(), cr.count()
    n_pairs = block(cl, cr).count()
    spark.stop()
    return {
        "street_model": street_model,
        "n_canonical": n_canonical,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "pairs_per_doc": round(n_pairs / n_docs, 1),
    }


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_pairs.json"
    rows = []
    for model in ("sharded", "global"):
        for n_canonical in (50_000, 500_000):
            r = measure(n_canonical, model)
            rows.append(r)
            print(json.dumps(r), flush=True)
    by = {(r["street_model"], r["n_canonical"]): r for r in rows}
    summary = {
        "rows": rows,
        "sharded_growth_100k_to_1M": round(
            by[("sharded", 500_000)]["pairs_per_doc"]
            / by[("sharded", 50_000)]["pairs_per_doc"],
            2,
        ),
        "global_growth_100k_to_1M": round(
            by[("global", 500_000)]["pairs_per_doc"]
            / by[("global", 50_000)]["pairs_per_doc"],
            2,
        ),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))


if __name__ == "__main__":
    main()
