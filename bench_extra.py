"""Supplementary measurements for the optimization rounds (bench.py is
frozen for the driver; everything exploratory lives here).

Modes (first CLI arg):
  phases   — per-phase wall breakdown of the flagship addr_link_2pass at
             the bench corpus size (side tables / clean / pass-1 / pass-2 /
             slim write / clustering), each phase labelled via
             setJobDescription. One JSON line.
  noop     — each headline query isolated with the noop sink (guide §1.4):
             computes every column of every row, discards the result, so
             the timing excludes collect/count short-circuits. One JSON
             line with min-of-2 per query.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_phases(sf_dir: str, cpus: int, reps: int = 2) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from bench import _sf_from_dir, corpus_size
    from uk_address_matcher_spark.clustering import cluster_predictions
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_documents,
    )
    from uk_address_matcher_spark.extract import extract_addresses
    from uk_address_matcher_spark.linkage import build_side_tables, link_cleaned
    from uk_address_matcher_spark.cleaning import clean_addresses
    from uk_address_matcher_spark.session import get_spark
    from pyspark.sql import functions as F

    sf = _sf_from_dir(sf_dir)
    n = corpus_size(sf)
    spark = get_spark(
        app_name="uam_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    sc = spark.sparkContext
    canon_docs, messy_docs, _ = grid_documents(spark, n, dup_factor=1)
    canon = extract_addresses(canon_docs).cache()
    messy = extract_addresses(messy_docs).cache()
    canon.count(), messy.count()

    runs = []
    for rep in range(reps):
        phases: dict[str, float] = {}

        def timed(name, fn):
            sc.setJobDescription(f"phase:{name}")
            t0 = time.time()
            out = fn()
            phases[name] = round(time.time() - t0, 3)
            sc.setJobDescription(None)
            return out

        t_all = time.time()
        side = timed(
            "side_tables",
            lambda: build_side_tables(
                spark, canon, rel_tok_freq=domain_token_frequencies(spark)
            ),
        )

        def _clean():
            tagged = canon.withColumn("__side", F.lit("c")).unionByName(
                messy.withColumn("__side", F.lit("m")), allowMissingColumns=True
            )
            cleaned = clean_addresses(
                tagged, side.rel_tok_freq, side.common_end_tokens
            ).cache()
            cleaned.count()
            return cleaned

        cleaned = timed("clean", _clean)
        cl = cleaned.filter(F.col("__side") == "c").drop("__side")
        cr = cleaned.filter(F.col("__side") == "m").drop("__side")

        # pass-1: block+score+prune+display-attach, materialised via cache
        from uk_address_matcher_spark.blocking import block
        from uk_address_matcher_spark.scoring import (
            attach_display_columns,
            score_pairs,
        )
        from uk_address_matcher_spark.second_pass import (
            PRUNE_MATCH_WEIGHT_THRESHOLD,
            PRUNE_TOP_N,
            improve_predictions_using_distinguishing_tokens,
        )

        def _pass1():
            pairs = block(cl, cr)
            pred = score_pairs(
                pairs,
                cl,
                cr,
                side.numeric_tf,
                threshold_match_weight=-50.0,
                retain_matching_columns=False,
                attach_display=False,
                prune_top_n=(PRUNE_MATCH_WEIGHT_THRESHOLD, PRUNE_TOP_N),
            )
            pred = attach_display_columns(
                pred, cl, cr, retain_matching_columns=False
            ).cache()
            # cache (not noop): pass-2 must NOT re-run pass-1's lineage,
            # or its phase time would double-count pass-1
            pred.count()
            return pred

        pred = timed("pass1_block_score", _pass1)
        improved = timed(
            "pass2_rescore",
            lambda: improve_predictions_using_distinguishing_tokens(pred),
        )
        pred_path = os.path.join(
            tempfile.gettempdir(), f"uam_bx_{os.getpid()}.parquet"
        )

        def _write():
            improved.select(
                "unique_id_l", "unique_id_r", "match_weight"
            ).write.mode("overwrite").parquet(pred_path)
            spark.catalog.clearCache()
            return spark.read.parquet(pred_path)

        slim = timed("slim_write", _write)
        n_pred = timed("slim_count", lambda: slim.count())
        clusters = timed(
            "cluster",
            lambda: cluster_predictions(slim, threshold_match_weight=5.0),
        )
        n_cluster = timed("cluster_count", lambda: clusters.count())
        phases["total"] = round(time.time() - t_all, 3)
        phases["n_pred"] = n_pred
        phases["n_cluster"] = n_cluster
        runs.append(phases)
        canon.cache().count(), messy.cache().count()
    spark.stop()
    best = {
        k: min(r[k] for r in runs)
        for k in runs[0]
        if k not in ("n_pred", "n_cluster")
    }
    return {
        "mode": "phases",
        "sf": sf,
        "cpus": cpus,
        "corpus_docs": 2 * n,
        "best": best,
        "runs": runs,
        "loadavg": open("/proc/loadavg").read().split()[:3],
    }


def run_noop(sf_dir: str, cpus: int, reps: int = 2) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F

    from uk_address_matcher_spark.session import get_spark
    from uk_address_matcher_spark.textops.analysis import (
        fingerprint,
        quality_features,
    )
    from uk_address_matcher_spark.textops.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from uk_address_matcher_spark.textops.similarity import brute_force_topk

    spark = get_spark(
        app_name="uam_bench_extra_noop",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    suite = [
        ("dedup_exact", lambda: exact_duplicates(docs, min_group_size=1)),
        (
            "dedup_minhash_lsh",
            lambda: minhash_lsh_pairs(docs, verify_threshold=0.3),
        ),
        (
            "knn_bruteforce",
            lambda: brute_force_topk(emb, emb.filter(F.col("vec_id") < 50), k=5),
        ),
        (
            "pricing_summary",
            lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
            ),
        ),
        (
            "doc_quality_fingerprint",
            lambda: quality_features(docs).join(fingerprint(docs), "doc_id"),
        ),
    ]
    runs = []
    for _ in range(reps):
        timings = {}
        for name, fn in suite:
            sc.setJobDescription(f"noop:{name}")
            t0 = time.time()
            _noop(fn())
            timings[name] = round(time.time() - t0, 3)
            sc.setJobDescription(None)
        runs.append(timings)
    spark.stop()
    return {
        "mode": "noop",
        "cpus": cpus,
        "best": {k: min(r[k] for r in runs) for k in runs[0]},
        "runs": runs,
        "loadavg": open("/proc/loadavg").read().split()[:3],
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if mode == "phases":
        out = run_phases(sf_dir, cpus)
    elif mode == "noop":
        out = run_noop(sf_dir, cpus)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
