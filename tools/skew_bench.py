"""Salted-vs-unsalted A/B under Zipf postcode skew — writes BENCH/SKEW.md.

The blocking exchange's worst case is a dense-city postcode hitting the
bare block_on('postcode') rule quadratically (reference
splink_model.json:86-88). This harness builds the 1M-doc grid corpus
with corpus.skew_postcodes (default: 10% of rows in 100 hot postcodes →
~250k candidate pairs per hot key), runs the SAME full linkage at
local[16] with salt=1 (AQE skew-join only) and salt=8 (explicit
replication salting), and reports wall time plus the max single-task
duration from the event log — the straggler signal salting exists to
fix. Row counts are asserted identical across variants.

Usage: python tools/skew_bench.py [n_canonical] [cpus]
Env: SKEW_N_HOT (100), SKEW_SHARE (0.10), SKEW_SALTS ("1,8")
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = os.path.join(tempfile.gettempdir(), "uam-skew-events")


def max_task_ms(app_id: str) -> tuple[float, str]:
    """(max task duration ms, stage name) across the app's tasks."""
    path = glob.glob(os.path.join(EVENT_DIR, f"*{app_id}*", "events_*"))
    if not path:
        path = glob.glob(os.path.join(EVENT_DIR, f"*{app_id}*"))
    stage_names = {}
    best, best_stage = 0.0, ""
    for line in open(path[0]):
        e = json.loads(line)
        ev = e.get("Event")
        if ev == "SparkListenerStageSubmitted":
            si = e["Stage Info"]
            stage_names[si["Stage ID"]] = si["Stage Name"][:60]
        elif ev == "SparkListenerTaskEnd":
            ti = e.get("Task Info", {})
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            if dur > best:
                best = dur
                best_stage = stage_names.get(e.get("Stage ID"), "?")
    return best, best_stage


def run_variant(salt: int, cpus: int, n: int, n_hot: int, share: float) -> dict:
    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_canonical_flat,
        messy_from_canonical,
        skew_postcodes,
    )
    from uk_address_matcher_spark.linkage import build_side_tables, link_addresses
    from uk_address_matcher_spark.session import get_spark

    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = get_spark(
        app_name=f"uam_skew_salt{salt}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    p = spark.sparkContext.defaultParallelism
    canon = skew_postcodes(
        grid_canonical_flat(spark, n), n_hot=n_hot, hot_share=share
    ).repartition(p).cache()
    messy, _ = messy_from_canonical(canon, dup_factor=1)
    messy = messy.repartition(p).cache()
    canon.count(), messy.count()
    side = build_side_tables(spark, canon, rel_tok_freq=domain_token_frequencies(spark))

    t0 = time.time()
    improved = link_addresses(canon, messy, side, salt=salt)
    out = os.path.join(tempfile.gettempdir(), f"uam_skew_{salt}_{os.getpid()}.parquet")
    improved.select("unique_id_l", "unique_id_r", "match_weight").write.mode(
        "overwrite"
    ).parquet(out)
    spark.catalog.clearCache()
    n_pred = spark.read.parquet(out).count()
    elapsed = time.time() - t0
    spark.stop()
    mt, stage = max_task_ms(app_id)
    shutil.rmtree(out, ignore_errors=True)
    return {
        "salt": salt,
        "cpus": cpus,
        "wall_s": round(elapsed, 1),
        "max_task_s": round(mt / 1000, 1),
        "max_task_stage": stage,
        "n_predictions": n_pred,
    }


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_hot = int(os.environ.get("SKEW_N_HOT", "100"))
    share = float(os.environ.get("SKEW_SHARE", "0.10"))
    salts = [int(s) for s in os.environ.get("SKEW_SALTS", "1,8").split(",")]

    results = [run_variant(s, cpus, n, n_hot, share) for s in salts]
    preds = {r["n_predictions"] for r in results}
    assert len(preds) == 1, f"salting changed results: {results}"
    rec = {"n": 2 * n, "n_hot": n_hot, "share": share, "results": results}
    print(json.dumps(rec))
    # append: the full A/B interleaves salt orders across process runs so
    # in-JVM JIT warm-up doesn't bias the second variant
    with open("/tmp/skew_bench.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
