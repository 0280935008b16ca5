"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Headline set:
 - addr_link_2pass: the flagship — full two-pass address linkage +
   clustering over a grid corpus sized to the scale factor (sf0.1 ->
   50k canonical + 50k messy interleaved documents)
 - dedup_minhash_lsh / dedup_exact: documents-table dedup
 - knn_bruteforce: embedding similarity search
 - pricing_summary: relational aggregate over lineitem
 - doc_quality_fingerprint: text-analysis scan

Noise discipline (this box drifts ±30-40% with invisible host load):
the whole suite runs TWICE, interleaved, and each query's recorded
time is the min of its two runs — the same methodology as
tools/scaling_bench.py. The record also carries both raw runs, the
canary values (knn_bruteforce / pricing_summary touch no linkage code,
so a drift there is host noise, not a plan change), and /proc/loadavg
at start, so a noisy record is self-identifying.

Scaling-efficiency evidence (N vs 4N cores) is produced separately by
tools/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Canary queries (sf0.1, local[32]): knn_bruteforce / pricing_summary
# touch no linkage code, so a min-of-2 exceeding the tolerance band means
# even the better run was noisy and the record should not be trusted as a
# plan-regression signal. References are DERIVED from the committed
# rolling history (min per query over green records) rather than
# hard-coded, so the gate survives corpus/suite changes without editing
# source; a green run appends its canary values back to the history.
CANARY_HISTORY = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "canary_history.json"
)
CANARY_TOL = 1.3


def _canary_refs(sf: float, cpus: int) -> dict[str, float]:
    # references are only comparable within one (sf, cpus) configuration:
    # a small-scale run's canaries are FASTER than the sf0.1 references,
    # so without this filter a green sf0.001 verify run would ratchet the
    # rolling min down and fail every future sf0.1 record
    with open(CANARY_HISTORY) as f:
        records = json.load(f)["records"]
    refs: dict[str, float] = {}
    for rec in records:
        if rec.get("sf") != sf or rec.get("cpus") != cpus:
            continue
        for q, v in rec.items():
            if q in ("source", "sf", "cpus"):
                continue
            refs[q] = min(refs.get(q, float("inf")), float(v))
    return refs


def _append_canary_record(
    best: dict[str, float], refs: dict[str, float], sf: float, cpus: int
) -> None:
    with open(CANARY_HISTORY) as f:
        hist = json.load(f)
    hist["records"].append(
        {
            "source": "bench.py green run",
            "sf": sf,
            "cpus": cpus,
            **{q: best[q] for q in refs},
        }
    )
    tmp = CANARY_HISTORY + ".tmp"
    with open(tmp, "w") as f:
        json.dump(hist, f, indent=2)
    os.replace(tmp, CANARY_HISTORY)


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def corpus_size(sf: float) -> int:
    return max(int(500_000 * sf), 1000)


def run_bench(sf_dir: str, cpus: int, corpus_n: int | None = None, reps: int = 2) -> dict:
    # before the JVM launches: the box has plenty of RAM and an evicted
    # cache silently re-runs its whole lineage (driver memory cannot be
    # raised after the first session)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F

    from uk_address_matcher_spark.corpus import (
        domain_token_frequencies,
        grid_documents,
    )
    from uk_address_matcher_spark.clustering import cluster_predictions
    from uk_address_matcher_spark.extract import extract_addresses
    from uk_address_matcher_spark.linkage import build_side_tables, link_addresses
    from uk_address_matcher_spark.session import get_spark
    from uk_address_matcher_spark.textops.analysis import fingerprint, quality_features
    from uk_address_matcher_spark.textops.dedup import exact_duplicates, minhash_lsh_pairs
    from uk_address_matcher_spark.textops.similarity import brute_force_topk

    try:
        loadavg_start = open("/proc/loadavg").read().split()[:3]
    except OSError:
        loadavg_start = None

    sf = _sf_from_dir(sf_dir)
    n = corpus_n if corpus_n is not None else corpus_size(sf)
    spark = get_spark(
        app_name="uam_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )

    meta: dict[str, float] = {}

    # --- fixed inputs (outside the timers) -------------------------------
    canon_docs, messy_docs, labels = grid_documents(spark, n, dup_factor=1)
    canon = extract_addresses(canon_docs).cache()
    messy = extract_addresses(messy_docs).cache()
    canon.count(), messy.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def _link_frames(canon_f, messy_f):
        side = build_side_tables(
            spark, canon_f, rel_tok_freq=domain_token_frequencies(spark)
        )
        improved = link_addresses(canon_f, messy_f, side)
        # the production pass boundary: persist the NARROW prediction
        # projection (ids + weight) to parquet and free the pipeline's
        # in-memory caches before clustering. Clustering then reads a
        # 3-column pruned scan; keeping everything cached instead leaves
        # GBs of wide map-carrying rows resident, and the resulting
        # GC/eviction churn costs more than the write (measured: 25s ->
        # 4s for the clustering phase at sf0.1)
        pred_path = os.path.join(
            tempfile.gettempdir(), f"uam_bench_pred_{os.getpid()}.parquet"
        )
        improved.select("unique_id_l", "unique_id_r", "match_weight").write.mode(
            "overwrite"
        ).parquet(pred_path)
        spark.catalog.clearCache()
        # the corpus caches are re-materialised for the next rep; keep the
        # timed region identical across reps
        slim = spark.read.parquet(pred_path)
        n_pred = slim.count()
        clusters = cluster_predictions(slim, threshold_match_weight=5.0)
        meta["n_cluster_rows"] = clusters.count()
        return n_pred

    def link():
        return _link_frames(canon, messy)

    suite = [
        ("addr_link_2pass", link),
        ("dedup_exact", lambda: exact_duplicates(docs, min_group_size=1).count()),
        (
            "dedup_minhash_lsh",
            lambda: minhash_lsh_pairs(docs, verify_threshold=0.3).count(),
        ),
        (
            "knn_bruteforce",
            lambda: brute_force_topk(emb, emb.filter(F.col("vec_id") < 50), k=5).count(),
        ),
        (
            "pricing_summary",
            lambda: li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
            .collect(),
        ),
        (
            "doc_quality_fingerprint",
            lambda: quality_features(docs).join(fingerprint(docs), "doc_id").count(),
        ),
    ]

    runs: list[dict[str, float]] = []
    n_pred_seen = set()
    for rep in range(reps):
        timings: dict[str, float] = {}
        for name, fn in suite:
            # link() clears ALL caches; re-pin the shared inputs so every
            # rep times the same work
            if name == "addr_link_2pass":
                canon.cache().count(), messy.cache().count()
            t0 = time.time()
            out = fn()
            timings[name] = round(time.time() - t0, 3)
            if name == "addr_link_2pass":
                n_pred_seen.add(out)
                docs.cache().count(), emb.cache().count()
        runs.append(timings)

    # Flagship stability retries: the link query runs ~20x longer than any
    # canary, so a host-noise burst can inflate BOTH link reps while the
    # short canaries land clean between bursts (observed: link reps 261s /
    # 47.8s with canaries green — a 5.5x rep disparity the canary gate
    # cannot see). If the two link walls disagree by more than
    # STABLE_RATIO, run extra link-only reps (bounded) until two agree or
    # the budget is spent; the record carries stable_ok either way.
    STABLE_RATIO = 1.5
    MAX_EXTRA_LINK_REPS = 2

    def _link_walls() -> list[float]:
        return sorted(r["addr_link_2pass"] for r in runs)

    extra = 0
    while (
        len(_link_walls()) >= 2
        and _link_walls()[1] > _link_walls()[0] * STABLE_RATIO
        and extra < MAX_EXTRA_LINK_REPS
    ):
        canon.cache().count(), messy.cache().count()
        t0 = time.time()
        out = link()
        wall = round(time.time() - t0, 3)
        n_pred_seen.add(out)
        docs.cache().count(), emb.cache().count()
        runs.append({"addr_link_2pass": wall})
        extra += 1
    walls = _link_walls()
    meta["link_stable_ok"] = bool(len(walls) < 2 or walls[1] <= walls[0] * STABLE_RATIO)

    if len(n_pred_seen) != 1:
        raise AssertionError(f"addr_link_2pass nondeterministic: {n_pred_seen}")
    meta["n_predictions"] = n_pred_seen.pop()

    best = {
        name: min(r[name] for r in runs if name in r) for name, _ in suite
    }
    canary_ref = _canary_refs(sf, cpus)
    canaries = {
        q: {
            "best": best[q],
            "ref": canary_ref[q],
            "ok": best[q] <= canary_ref[q] * CANARY_TOL,
        }
        for q in canary_ref
    }
    # no history for this (sf, cpus) yet: the record can't be gated, but a
    # run with clean inter-rep stability seeds the history for next time
    canary_ok = all(c["ok"] for c in canaries.values()) if canary_ref else None
    if canary_ref and canary_ok:
        _append_canary_record(best, canary_ref, sf, cpus)
    elif not canary_ref and meta.get("link_stable_ok"):
        _append_canary_record(
            best, {"knn_bruteforce": 0, "pricing_summary": 0}, sf, cpus
        )

    # Ref-scale flagship: the reference's 15,008 addr/s baseline
    # (BASELINE.md) was measured over 450,472 addresses (176,640 messy +
    # 273,832 canonical), not the sf0.1 corpus's 100k docs — at 100k this
    # engine's wall is dominated by per-job constants (driver barriers,
    # broadcast builds, stage scheduling) that are FIXED, not
    # data-proportional, so docs/s at sf0.1 understates throughput at the
    # baseline's own scale. Run the identical link+cluster job once more
    # on a corpus sized to the reference's row count (225k canonical +
    # 225k messy = 450k docs) and record docs/s there too — the
    # same-data-scale comparator. min-of-2 with the same stability rule.
    refscale = None
    sf_cluster_rows = meta.get("n_cluster_rows")
    if sf >= 0.1 and os.environ.get("SPARK_GRAFT_REFSCALE", "1") != "0":
        # override for smoke tests only; the recorded figure uses the
        # reference-matched default
        n_ref = int(os.environ.get("SPARK_GRAFT_REFSCALE_N", "225000"))
        docs.unpersist(), emb.unpersist()
        canon.unpersist(), messy.unpersist()
        rc_docs, rm_docs, _ = grid_documents(spark, n_ref, dup_factor=1)
        rcanon = extract_addresses(rc_docs).cache()
        rmessy = extract_addresses(rm_docs).cache()
        rcanon.count(), rmessy.count()
        ref_walls: list[float] = []
        ref_preds = set()
        for _ in range(2):
            t0 = time.time()
            ref_preds.add(_link_frames(rcanon, rmessy))
            ref_walls.append(round(time.time() - t0, 3))
            rcanon.cache().count(), rmessy.cache().count()
        ref_walls.sort()
        if ref_walls[1] > ref_walls[0] * STABLE_RATIO:
            t0 = time.time()
            ref_preds.add(_link_frames(rcanon, rmessy))
            ref_walls.append(round(time.time() - t0, 3))
            ref_walls.sort()
        if len(ref_preds) != 1:
            raise AssertionError(f"refscale link nondeterministic: {ref_preds}")
        refscale = {
            "corpus_docs": 2 * n_ref,
            "link_wall_best": ref_walls[0],
            "link_docs_per_sec": round(2 * n_ref / ref_walls[0], 1),
            "runs": ref_walls,
            "n_predictions": ref_preds.pop(),
            "n_cluster_rows": meta.get("n_cluster_rows"),
            "stable_ok": ref_walls[1] <= ref_walls[0] * STABLE_RATIO
            if len(ref_walls) >= 2
            else True,
        }

    total = round(sum(best.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": best,
        "runs": runs,
        "canaries": canaries,
        "canary_ok": canary_ok,
        "link_stable_ok": meta.get("link_stable_ok"),
        "loadavg_start": loadavg_start,
        "sf": sf,
        "cpus": cpus,
        "corpus_docs": 2 * n,
        "link_docs_per_sec": round(2 * n / best["addr_link_2pass"], 1),
        "n_predictions": meta.get("n_predictions"),
        "n_cluster_rows": sf_cluster_rows,
    }
    if refscale is not None:
        result["refscale"] = refscale
    spark.stop()
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
