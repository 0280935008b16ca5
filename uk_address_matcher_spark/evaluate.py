"""Label-based evaluation: top-1 accuracy + pairwise precision/recall/F1.

Top-1 accuracy mirrors /root/reference/uk_address_matcher/post_linkage/
accuracy_from_labels.py:294-365 (deterministic tie-break unique_id_l ASC,
CUBE-style Total row). Pairwise F1 is the BASELINE.json target metric:
predicted pairs = best match per labeled messy record; a pair is correct
when it equals the labeled (unique_id, correct_unique_id) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_predictions(df_predict: DataFrame) -> DataFrame:
    w = Window.partitionBy("unique_id_r").orderBy(
        F.desc("match_weight"), F.asc("unique_id_l")
    )
    return (
        df_predict.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("unique_id_r", F.col("unique_id_l").alias("predicted_unique_id"), "match_weight")
    )


def evaluate_predictions_against_labels(
    labels: DataFrame, df_predict: DataFrame
) -> DataFrame:
    """(status, count, percentage) with a CUBE Total row —
    accuracy_from_labels.py:328-365."""
    top = top_predictions(df_predict)
    cmp = labels.join(top, labels["unique_id"] == top["unique_id_r"], "inner").select(
        F.when(
            F.col("predicted_unique_id") == F.col("correct_unique_id").cast("string"),
            F.lit("Correctly Predicted"),
        )
        .otherwise(F.lit("Incorrectly Predicted"))
        .alias("status")
    )
    counts = cmp.cube("status").count().withColumnRenamed("count", "cnt")
    total = counts.filter(F.col("status").isNull()).select(
        F.col("cnt").alias("total_cnt")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.coalesce(F.col("status"), F.lit("Total")).alias("status"),
            F.col("cnt").alias("count"),
            (100.0 * F.col("cnt") / F.col("total_cnt")).alias("percentage"),
        )
        .orderBy(F.col("status") == "Total", "status")
    )


def pairwise_f1(labels: DataFrame, df_predict: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of best-match pairs vs labeled pairs.

    Every labeled messy record contributes exactly one true pair; the
    engine contributes at most one predicted pair per messy record.
    """
    top = top_predictions(df_predict)
    joined = labels.join(
        top, labels["unique_id"] == top["unique_id_r"], "left"
    ).select(
        "unique_id",
        "correct_unique_id",
        "predicted_unique_id",
    )
    agg = joined.agg(
        F.count("*").alias("n_labels"),
        F.count("predicted_unique_id").alias("n_predicted"),
        F.sum(
            F.when(
                F.col("predicted_unique_id") == F.col("correct_unique_id").cast("string"),
                1,
            ).otherwise(0)
        ).alias("n_correct"),
    ).collect()[0]
    n_labels, n_predicted, n_correct = (
        agg["n_labels"],
        agg["n_predicted"],
        int(agg["n_correct"] or 0),
    )
    precision = n_correct / n_predicted if n_predicted else 0.0
    recall = n_correct / n_labels if n_labels else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "n_labels": n_labels,
        "n_predicted": n_predicted,
        "n_correct": n_correct,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
