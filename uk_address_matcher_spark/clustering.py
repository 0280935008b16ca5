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
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # AQE partition coalescing (on in session.py) right-sizes the loop's
    # tiny label shuffles at runtime — no session-conf mutation, which
    # would re-plan concurrent jobs on the shared session at the wrong
    # width.
    und = und.dropDuplicates().cache()
    und.count()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    return _iterate(und, labels, max_iterations, checkpointer)


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


def bipartite_components(
    edges: DataFrame,
    max_rounds: int = 12,
    checkpointer=None,
) -> DataFrame:
    """(node, component) for a BIPARTITE edge set (src = canonical side,
    dst = messy side, the shape every match graph has: every scored pair
    joins one canonical to one messy record).

    Exploits bipartiteness to cut the barrier count vs general
    connected_components: labels live on the canonical side only
    (|canonical| rows instead of |nodes|), one round is a 2-hop min
    propagation (canonical -> messy -> canonical, 4 narrow shuffles =
    2 shuffles per hop), and two fixed pointer-doubling steps collapse
    label chains by 4x per round without per-step convergence jobs.
    Match graphs are near-star, so 1-2 rounds converge; component ids are
    the minimum member id (identical contract to connected_components),
    deterministic at any parallelism.
    """
    e = edges.select(F.col("src").alias("c"), F.col("dst").alias("m"))
    e = e.dropDuplicates().cache()
    e.count()

    lab = e.select("c").distinct().withColumn("lab", F.col("c")).localCheckpoint()

    def two_hop(lab_df):
        # min label over the 2-hop neighbourhood; c is in N(m) for every
        # m in N(c), so the min already covers the node's own label
        m_min = (
            e.join(lab_df, "c")
            .groupBy("m")
            .agg(F.min("lab").alias("mlab"))
        )
        return (
            e.join(m_min, "m").groupBy("c").agg(F.min("mlab").alias("lab")),
            m_min,
        )

    m_min = None
    for i in range(max_rounds):
        new_lab, m_min = two_hop(lab)
        # two pointer-doubling steps (lab values are canonical ids, so a
        # label's label exists): chains shrink 4x per round; no
        # convergence job per step — the outer check catches the rest
        for _ in range(2):
            ptr = new_lab.select(F.col("c").alias("lab"), F.col("lab").alias("root"))
            new_lab = new_lab.join(ptr, "lab").select("c", F.col("root").alias("lab"))
        if checkpointer is not None:
            new_lab = checkpointer.checkpoint(new_lab, f"bcc_round_{i}")
        else:
            new_lab = new_lab.localCheckpoint()
        changed = (
            lab.withColumnRenamed("lab", "old")
            .join(new_lab, "c")
            .filter(F.col("old") != F.col("lab"))
            .count()
        )
        lab = new_lab
        if changed == 0:
            break
    else:
        raise RuntimeError(f"bipartite_components: no convergence in {max_rounds} rounds")

    # messy-side labels from the final round's m_min re-resolved through
    # the final canonical labels (one join on the already-final labels)
    m_lab = (
        e.join(lab, "c").groupBy("m").agg(F.min("lab").alias("lab"))
    )
    members = lab.select(F.col("c").alias("node"), "lab").union(
        m_lab.select(F.col("m").alias("node"), "lab")
    )
    # contract parity with connected_components: component id = min member
    # id across BOTH sides (two extra narrow shuffles on tiny frames)
    comp_min = members.groupBy("lab").agg(F.min("node").alias("component"))
    return members.join(comp_min, "lab").select("node", "component")


def cluster_predictions(
    df_predict: DataFrame,
    threshold_match_weight: float = 5.0,
    checkpointer=None,
) -> DataFrame:
    """(unique_id, cluster_id) for every id in an above-threshold pair.

    cluster_id is the lexicographically smallest member id — deterministic
    at any parallelism. Uses the bipartite specialisation (scored pairs
    always join the canonical side to the messy side).
    """
    edges = df_predict.filter(
        F.col("match_weight") >= threshold_match_weight
    ).select(F.col("unique_id_l").alias("src"), F.col("unique_id_r").alias("dst"))
    cc = bipartite_components(edges, checkpointer=checkpointer)
    return cc.select(
        F.col("node").alias("unique_id"), F.col("component").alias("cluster_id")
    )
