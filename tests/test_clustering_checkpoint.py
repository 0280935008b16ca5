"""Clustering convergence + checkpoint/resume tests."""

import os

from pyspark.sql import functions as F

from uk_address_matcher_spark.checkpoint import CheckpointManager
from uk_address_matcher_spark.clustering import (
    cluster_predictions,
    connected_components,
)


def test_connected_components_chain(spark):
    # chain a-b-c-d plus isolated pair x-y: two components
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_deterministic_cluster_ids(spark):
    edges = spark.createDataFrame(
        [("m2", "c9"), ("c9", "m7"), ("m7", "c1")], "src string, dst string"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(cc.values()) == {"c1"}  # lexicographic min of the component


def test_cluster_predictions_threshold(spark):
    pred = spark.createDataFrame(
        [
            ("c1", "m1", 20.0),
            ("c1", "m2", 20.0),
            ("c2", "m3", 20.0),
            ("c3", "m9", -5.0),  # below threshold: excluded
        ],
        "unique_id_l string, unique_id_r string, match_weight double",
    )
    out = {r["unique_id"]: r["cluster_id"] for r in cluster_predictions(pred, 5.0).collect()}
    assert out["m1"] == "c1" and out["m2"] == "c1" and out["c1"] == "c1"
    assert out["m3"] == "c2"
    assert "m9" not in out and "c3" not in out


def test_checkpoint_manifest_and_resume(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    ck = CheckpointManager(spark, base)
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = ck.checkpoint(df, "pass_a")
    assert out.count() == 100
    assert ck.has("pass_a")
    m = ck.manifest["passes"]["pass_a"]
    assert m["metrics"]["n_rows"] == 100
    assert m["metrics"]["n_partitions"] >= 1
    assert os.path.exists(os.path.join(base, "_manifest.json"))

    # resume: a new manager must serve the stored data without rewriting
    ck2 = CheckpointManager(spark, base, resume=True)
    before_mtime = os.path.getmtime(os.path.join(base, "_manifest.json"))
    out2 = ck2.checkpoint(spark.range(5).withColumn("v", F.lit(0)), "pass_a")
    assert out2.count() == 100  # stored result, not the new 5-row frame
    assert os.path.getmtime(os.path.join(base, "_manifest.json")) == before_mtime


def test_connected_components_with_checkpointer(spark, tmp_path):
    ck = CheckpointManager(spark, str(tmp_path / "cc"))
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("p", "q")], "src string, dst string"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges, checkpointer=ck).collect()}
    assert cc["c"] == "a" and cc["q"] == "p"
    assert any(k.startswith("cc_iter_") for k in ck.manifest["passes"])


def test_bipartite_components_matches_general_cc(spark):
    # random-ish bipartite graph incl. a chain c0-m0-c1-m1-...-c5 (tests
    # multi-round convergence) and isolated stars
    from uk_address_matcher_spark.clustering import bipartite_components

    chain = [(f"c{i}", f"m{i}") for i in range(6)] + [
        (f"c{i + 1}", f"m{i}") for i in range(5)
    ]
    stars = [("c100", f"m10{j}") for j in range(4)] + [("c200", "m300")]
    edges = spark.createDataFrame(chain + stars, "src string, dst string")
    bi = {r["node"]: r["component"] for r in bipartite_components(edges).collect()}
    from uk_address_matcher_spark.clustering import connected_components

    gen = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert bi == gen
    assert bi["c5"] == "c0" and bi["m4"] == "c0"
    assert bi["m103"] == "c100"


def test_bipartite_components_with_checkpointer(spark, tmp_path):
    from uk_address_matcher_spark.checkpoint import CheckpointManager
    from uk_address_matcher_spark.clustering import bipartite_components

    ck = CheckpointManager(spark, str(tmp_path / "bcc"))
    edges = spark.createDataFrame(
        [("c1", "m1"), ("c2", "m1"), ("c9", "m9")], "src string, dst string"
    )
    cc = {r["node"]: r["component"] for r in bipartite_components(edges, checkpointer=ck).collect()}
    assert cc == {"c1": "c1", "c2": "c1", "m1": "c1", "c9": "c9", "m9": "c9"}
    assert any(k.startswith("bcc_round_") for k in ck.manifest["passes"])
