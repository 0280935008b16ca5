"""A/B the flagship linkage wall between scoring-kernel variants.

One PROCESS per sample with variants interleaved across processes
(A B A B ...): in-JVM repeats are unusable for comparisons on this box —
C2 JIT + codegen caching make walls fall monotonically across runs
regardless of variant order. Each child replays exactly the bench.py
addr_link_2pass flow (50k+50k grid corpus, side tables, two-pass link,
slim parquet barrier, transitive clustering) and prints one JSON line.

Usage: python tools/ab_link.py [n_rounds=2] [cpus=32] [n_canonical=50000]
Variants: 'bnb' (two-stage branch-and-bound kernel, the default path)
vs 'single' (early_exit=False single-stage kernel).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import functools, json, os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
variant = sys.argv[1]
cpus = int(sys.argv[2])
n_canon = int(sys.argv[3])

from pyspark.sql import functions as F
from uk_address_matcher_spark.corpus import domain_token_frequencies, grid_documents
from uk_address_matcher_spark.clustering import cluster_predictions
from uk_address_matcher_spark.extract import extract_addresses
from uk_address_matcher_spark.linkage import build_side_tables, link_addresses
from uk_address_matcher_spark.session import get_spark
import uk_address_matcher_spark.linkage as L
import uk_address_matcher_spark.scoring as S

L.score_pairs = functools.partial(S.score_pairs, early_exit=(variant == "bnb"))

spark = get_spark(app_name=f"uam_ab_{variant}", master=f"local[{cpus}]",
                  shuffle_partitions=max(2 * cpus, 8))
canon_docs, messy_docs, _ = grid_documents(spark, n_canon, dup_factor=1)
canon = extract_addresses(canon_docs)
messy = extract_addresses(messy_docs)
if os.environ.get("AB_SKEW", "0") == "1":
    # junk-heavy corpus variant for the B&B activation question: remap a
    # large row share into few postcodes so rule 18 (bare postcode)
    # floods the candidate set with cross-street junk pairs
    from uk_address_matcher_spark.corpus import skew_postcodes
    n_hot = int(os.environ.get("AB_SKEW_NHOT", "50"))
    share = float(os.environ.get("AB_SKEW_SHARE", "0.5"))
    canon = skew_postcodes(canon, n_hot=n_hot, hot_share=share)
    messy = skew_postcodes(messy, n_hot=n_hot, hot_share=share)
canon = canon.cache()
messy = messy.cache()
canon.count(), messy.count()

t0 = time.time()
side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))
improved = link_addresses(canon, messy, side)
pred_path = os.path.join(tempfile.gettempdir(), f"uam_ab_{os.getpid()}.parquet")
improved.select("unique_id_l", "unique_id_r", "match_weight").write.mode(
    "overwrite").parquet(pred_path)
spark.catalog.clearCache()
slim = spark.read.parquet(pred_path)
n_pred = slim.count()
clusters = cluster_predictions(slim, threshold_match_weight=5.0)
n_clusters = clusters.count()
wall = time.time() - t0
print(json.dumps({"variant": variant, "wall": round(wall, 2),
                  "n_predictions": n_pred, "n_cluster_rows": n_clusters}))
spark.stop()
""" % {"repo": REPO}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    n_canon = sys.argv[3] if len(sys.argv) > 3 else "50000"
    results: dict[str, list[dict]] = {"bnb": [], "single": []}
    for _ in range(rounds):
        for variant in ("bnb", "single"):
            with open("/proc/loadavg") as f:
                load = f.read().split()[0]
            out = subprocess.run(
                [sys.executable, "-c", CHILD, variant, cpus, n_canon],
                capture_output=True, text=True, cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            rec["loadavg_at_start"] = load
            results[variant].append(rec)
            print(json.dumps(rec), flush=True)
    preds = {r["n_predictions"] for v in results.values() for r in v}
    assert len(preds) == 1, f"variants disagree on predictions: {preds}"
    summary = {
        v: {"min": min(r["wall"] for r in rs), "walls": [r["wall"] for r in rs]}
        for v, rs in results.items()
    }
    summary["speedup_min_over_min"] = round(
        summary["single"]["min"] / summary["bnb"]["min"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
