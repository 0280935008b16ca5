"""Transitive clustering: connected components over scored match pairs.

Not present in the reference (it selects one best match per messy record);
added per the north rule. Algorithm: iterative min-label propagation — the
DataFrame formulation of Kiveris et al., "Connected Components in MapReduce
and Beyond" (the simple variant; alternating large-star/small-star is noted
below for graphs with large diameter).

Each iteration is one shuffle (groupBy node) over a frame of (node, label)
pairs — narrow strings only. Lineage is truncated every iteration with
localCheckpoint (or a durable checkpointer), so the plan does not grow with
iteration count; convergence = zero changed labels (a count, not a
collect). Iterations needed = graph diameter; match graphs are near-star
(messy records point at canonical records), so 2-4 iterations is typical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_from_predictions(
    df_predict: DataFrame, threshold_match_weight: float
) -> DataFrame:
    """(src, dst) edges from scored pairs above the threshold."""
    return (
        df_predict.filter(F.col("match_weight") >= threshold_match_weight)
        .select(F.col("unique_id_l").alias("src"), F.col("unique_id_r").alias("dst"))
        .dropDuplicates()
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpointer=None,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``checkpointer`` (checkpoint.CheckpointManager) makes each iteration
    durable + resumable; otherwise localCheckpoint truncates lineage in
    memory. Raises if not converged within max_iterations.
    """
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    und = und.dropDuplicates().cache()
    n_edges = und.count()
    # label frames are narrow (two strings): size the loop's shuffle width
    # to the data (~30k edge rows per task) instead of the session width —
    # tiny graphs would otherwise pay per-stage latency x width, while big
    # graphs must keep every core busy through the iterations
    loop_parts = max(min(int(prev_parts), n_edges // 30000 + 1), 4)
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    try:
        labels = _iterate(und, labels, max_iterations, checkpointer)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return labels


def _iterate(und, labels, max_iterations, checkpointer):
    for i in range(max_iterations):
        # each node proposes its label to its neighbours; keep the min of
        # (own label, proposals)
        proposals = und.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "component")
        new_labels = (
            proposals.union(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping (path doubling): follow each component pointer
        # one more hop — component ids are themselves node ids, so chains
        # collapse in O(log diameter) iterations instead of O(diameter).
        # Street-shaped match graphs produce chains ~ the postcode-sector
        # size, so this matters.
        ptr = new_labels.select(
            F.col("node").alias("component"), F.col("component").alias("root")
        )
        new_labels = (
            new_labels.join(ptr, "component")
            .select("node", F.col("root").alias("component"))
        )
        if checkpointer is not None:
            new_labels = checkpointer.checkpoint(new_labels, f"cc_iter_{i}")
        else:
            new_labels = new_labels.localCheckpoint()
        # convergence check every 2nd iteration: the check is its own
        # shuffle+job; early iterations never converge, so checking each
        # round just adds latency
        if i % 2 == 1 or i >= max_iterations - 2:
            changed = (
                labels.withColumnRenamed("component", "old")
                .join(new_labels, "node")
                .filter(F.col("old") != F.col("component"))
                .count()
            )
            if changed == 0:
                return new_labels
        labels = new_labels
    raise RuntimeError(f"connected_components: no convergence in {max_iterations} iterations")


def cluster_predictions(
    df_predict: DataFrame,
    threshold_match_weight: float = 5.0,
    checkpointer=None,
) -> DataFrame:
    """(unique_id, cluster_id) for every id in an above-threshold pair.

    cluster_id is the lexicographically smallest member id — deterministic
    at any parallelism.
    """
    edges = edges_from_predictions(df_predict, threshold_match_weight)
    cc = connected_components(edges, checkpointer=checkpointer)
    return cc.select(
        F.col("node").alias("unique_id"), F.col("component").alias("cluster_id")
    )
