"""Hardware-ceiling controls for the scaling bench, measured the SAME DAY
as the pipeline runs (this sandbox's host contention varies by the hour,
so a control measured on another day is not a valid ceiling).

Two strong-scaling controls at each (lo, hi) core pair over FIXED work:
 - cpu:     whole-stage-codegen hash loop, no shuffle, no disk
 - shuffle: repartition exchange of ~2 GB of rows

Usage: python tools/controls_bench.py [lo hi [lo hi ...]]
Writes /tmp/controls_r3.json  {"cpu_4_16": ..., "shuffle_4_16": ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cpus):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ctl{cpus}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def cpu_control(cpus, n=8_000_000_000):
    from pyspark.sql import functions as F

    spark = _session(cpus)
    df = spark.range(n, numPartitions=64)
    t0 = time.time()
    df.select(F.xxhash64("id").alias("h")).select(
        F.max(F.xxhash64("h", "h"))
    ).collect()
    el = time.time() - t0
    spark.stop()
    return el


def shuffle_control(cpus, n=120_000_000):
    from pyspark.sql import functions as F

    spark = _session(cpus)
    df = spark.range(n, numPartitions=64).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    t0 = time.time()
    df.repartition(64, "payload").agg(F.count("*")).collect()
    el = time.time() - t0
    spark.stop()
    return el


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    pairs = []
    args = [int(a) for a in sys.argv[1:]]
    if args:
        pairs = list(zip(args[::2], args[1::2]))
    else:
        pairs = [(4, 16), (8, 32)]
    out = {}
    for lo, hi in pairs:
        c_lo, c_hi = cpu_control(lo), cpu_control(hi)
        s_lo, s_hi = shuffle_control(lo), shuffle_control(hi)
        out[f"cpu_{lo}_{hi}"] = round(c_lo / c_hi / (hi / lo), 3)
        out[f"shuffle_{lo}_{hi}"] = round(s_lo / s_hi / (hi / lo), 3)
        out[f"_walls_{lo}_{hi}"] = {
            "cpu_lo": round(c_lo, 1), "cpu_hi": round(c_hi, 1),
            "shuffle_lo": round(s_lo, 1), "shuffle_hi": round(s_hi, 1),
        }
    with open("/tmp/controls_r3.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
