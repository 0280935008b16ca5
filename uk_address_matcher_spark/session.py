"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point and safe for local[*] testing:
 - AQE on (runtime re-planning, skew-join splitting, partition coalescing)
 - Arrow on (vectorized pandas UDF exchange; the only Python in the hot
   path is Arrow-batched)
 - shuffle partitions sized by caller (cluster: ~2-3x total cores)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str | None:
    """Prefer a tmpfs for shuffle/spill files when one is safe to use.

    Sort-shuffle writes one data+index file pair per map task; on slow
    filesystems the open/close metadata cost dominates for small
    shuffles (measured here: 14s of cumulative write time for 0.8MB of
    shuffle data on the root disk vs microseconds on tmpfs). On a real
    cluster this is the job of fast local NVMe — locally /dev/shm is the
    equivalent.

    Guard rails (tmpfs is RAM: a job that spills BECAUSE memory is short
    must not also spill INTO memory): explicit SPARK_LOCAL_DIRS always
    wins; SPARK_GRAFT_TMPFS_SHUFFLE=0 disables, =1 forces; the default
    ("auto") uses /dev/shm only when its free capacity is at least
    SPARK_GRAFT_TMPFS_MIN_FREE_GB (default 8) GiB, falling back to the
    normal disk local dir otherwise.
    """
    if os.environ.get("SPARK_LOCAL_DIRS"):
        return None
    mode = os.environ.get("SPARK_GRAFT_TMPFS_SHUFFLE", "auto")
    if mode == "0":
        return None
    shm = "/dev/shm"
    if not (os.path.isdir(shm) and os.access(shm, os.W_OK)):
        return None
    if mode != "1":
        min_free_gb = float(os.environ.get("SPARK_GRAFT_TMPFS_MIN_FREE_GB", "8"))
        try:
            st = os.statvfs(shm)
            free_gb = st.f_bavail * st.f_frsize / (1 << 30)
        except OSError:
            return None
        if free_gb < min_free_gb:
            return None
    return os.path.join(shm, f"spark-local-{os.getuid()}")


def get_spark(
    app_name: str = "uk_address_matcher_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # This pipeline's pair-scale exchanges are CPU-dense but
        # byte-light (compact signature rows fan out into histogram/map
        # algebra downstream), so AQE's byte-targeted coalescing packs
        # ~50 CPU-core-seconds into one post-shuffle partition: at 1M
        # docs / 16 cores the two second-pass stages were coalesced to
        # 22-24 partitions of ~48 CPU-s each — 1.5 ragged task waves
        # with the last wave mostly idle (event-log profile, round 5).
        # A 16 MB advisory target keeps partition counts high enough
        # for >=2-4 tasks/core at every level we run; tiny shuffles
        # still coalesce (minPartitionSize default 1 MB), and the knob
        # only shapes AQE shuffle reads, not file scans.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "16m"),
        )
        # FILE-scan splits get the same treatment as AQE shuffle reads
        # (and for the same reason): the durable pass artifacts are
        # CPU-dense per byte — the pass-1 scoring stage reads the 552 MB
        # (round-5) blocked-pairs checkpoint and burned ~774 executor-CPU-s on it
        # (~1.9 CPU-s/MB; event-log profile, 1M docs / 16 cores). At the
        # 128 MB default that stage split into 16 tasks — ONE wave at 16
        # cores, so its wall was its slowest task (56.8 s vs a 48.4 s
        # balanced floor). 16 MB keeps scans at >=3 tasks/core at every
        # level run here. On a multi-thousand-core cluster reading
        # 100 TB, raise SPARK_GRAFT_MAX_PARTITION_BYTES back toward
        # 128m: scan-task count stops being the binding constraint long
        # before scheduler pressure does.
        # The 16m default applies ONLY to local[*] masters, where the
        # single-wave scan problem was measured (<=32 cores); on a real
        # cluster the library keeps Spark's 128m — a multi-thousand-core
        # deployment reading 100 TB would otherwise multiply its scan-task
        # count ~8x. SPARK_GRAFT_MAX_PARTITION_BYTES overrides either way.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES",
                "16m" if master.startswith("local") else "128m",
            ),
        )
        # NOTE: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
        # stays at its default (false). Enabling it lets AQE coalesce
        # cached builds by BYTES, which collapsed the second pass's
        # per_pair cache (50MB but ~100 CPU-core-s of downstream map
        # algebra) to 13 partitions — a 2x wall regression. Small cached
        # frames size their own partitioning explicitly instead
        # (clustering.py loop_parts).
        # Unordered limit-collects (side-table guard collects, the
        # clustering conflict/disjointness collects) run through
        # executeTake, which by default probes 1 shuffle partition, then
        # 4x more per round — every round a sequential JOB with its own
        # scheduling latency. All such collects here either must scan
        # every partition anyway (the limit is an OOM guard above the
        # true row count, or the expected result is empty) or are
        # bounded diagnostics, so probing all partitions in ONE job
        # strictly reduces driver round-trips (measured: the clustering
        # fast path's two collects were 3-4 jobs each at sf0.1).
        # ORDER BY ... LIMIT paths (TakeOrderedAndProject) are unaffected.
        .config("spark.sql.limit.initialNumPartitions", "1000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # deterministic, locale-independent string comparison
        .config("spark.sql.legacy.respectNullabilityInTextDatasetConversion", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config(
            "spark.driver.extraJavaOptions", java_opts
        ).config("spark.executor.extraJavaOptions", java_opts)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    local_dir = _default_local_dir()
    if local_dir is not None:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
