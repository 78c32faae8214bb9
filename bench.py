"""Benchmark harness (driver contract): run the headline dedup queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Headline set = the engine's scale-critical paths:
  - full dedup pipeline (MinHash/LSH -> verify -> substring -> components)
  - the individual web-scale passes
  - the reference's own benchmark shape: 6-feature compare at ~5e4 pairs
    (jaro, jarowinkler@.85, date, 2x exact, levenshtein@.85 —
    /root/reference/benchmarks/bench_comparing.py:6-111)
  - ECM fit+predict on 50k seeded binary vectors
  - ANN cosine top-k over embeddings

Artifact-integrity protocol (round 4): this host is a shared VM whose
effective memory bandwidth swings 5-7x between minutes
(BENCH/BASELINE.md), so a single-shot timing is a noise sample, not a
measurement. The recorded JSON therefore:

  1. brackets the run with the pure-JVM page-cache scan probe from
     scripts/scaling_control.py (fresh child JVM at local[4]) and embeds
     both probe values next to the archived quiet-host value
     (BENCH/CONTROLS.json);
  2. runs the full query list ROUND-ROBIN $SPARK_GRAFT_BENCH_REPEATS
     times (default 3) and reports best-of per query — round-robin, not
     back-to-back, so one bad minute cannot sink every sample of one
     query — with every raw run kept under "runs";
  3. sets "host_degraded": true when either probe lands below
     archive/1.5 — the numbers are still recorded, but flagged.

Set SPARK_GRAFT_BENCH_REPEATS=1 and SPARK_GRAFT_BENCH_PROBE=0 for quick
iteration runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
RUN_PROBE = os.environ.get("SPARK_GRAFT_BENCH_PROBE", "1") != "0"

REPO = Path(__file__).resolve().parent
# Archived quiet-host value for the local[4] scan control over the 2M-doc
# corpus (BENCH/CONTROLS.json "scan"."local4"); same constant as
# scripts/scaling_gate.py.
QUIET_SCAN_ROWS_PER_SEC = 1_577_548.8
HEALTH_FACTOR = 1.5


def scan_probe() -> dict:
    """Pure-JVM page-cache parquet scan at local[4] in a fresh child JVM
    (scripts/scaling_control.py --child scan 4). Memory-bandwidth-bound by
    construction — its rows/s against the archived quiet value is the
    host-health verdict. The child generates its deterministic 2M-doc
    corpus on first use (~1 min, then page-cache resident)."""
    script = REPO / "scripts" / "scaling_control.py"
    try:
        out = subprocess.run(
            [sys.executable, str(script), "--child", "scan", "4"],
            capture_output=True, text=True, cwd=str(REPO), timeout=1800,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                res = json.loads(line)
                res["healthy"] = (
                    res["rows_per_sec"] >= QUIET_SCAN_ROWS_PER_SEC / HEALTH_FACTOR
                )
                return res
        return {"error": (out.stdout[-300:] + out.stderr[-300:]).strip(),
                "healthy": None}
    except Exception as exc:  # probe failure must never sink the bench
        return {"error": str(exc)[:300], "healthy": None}


def main() -> None:
    from pyspark.sql import functions as F

    from recordlinkage_spark.config import EngineConfig, get_spark
    from recordlinkage_spark.classifiers import ECMClassifier
    from recordlinkage_spark.comparing import Compare
    from recordlinkage_spark.datagen import binary_vectors
    from recordlinkage_spark.indexing import Block
    from recordlinkage_spark.minhash import MinHashLSH
    from recordlinkage_spark.network import ConnectedComponents
    from recordlinkage_spark.pipeline import DedupPipeline
    from recordlinkage_spark.simhash import SimHash
    from recordlinkage_spark.suffix import (FingerprintSubstring,
                                            remove_duplicate_spans)
    from recordlinkage_spark import ann
    from recordlinkage_spark.semdedup import semantic_dedup

    pre_probe = scan_probe() if RUN_PROBE else {"skipped": True, "healthy": None}

    # Task-slot sizing: every pandas-UDF stage keeps one JVM task thread
    # PLUS one Python worker hot per slot, so local[k] uses ~2k threads.
    # On this 32-vCPU box local[32] runs 64 hot threads — 2x
    # oversubscription the hypervisor punishes with 15-20% steal (measured
    # 4x slower than local[16]). Budget slots so slots + workers fit the
    # allotted CPUs, exactly how real executors are sized.
    cpus = int(CPUS)
    slots = cpus if cpus <= 16 else cpus // 2
    spark = get_spark("recordlinkage-bench", master=f"local[{slots}]",
                      shuffle_partitions=max(2 * slots, 16))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    n_docs = docs.count()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").cache()
    cust.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()

    # 1. full dedup pipeline over documents
    cfg = EngineConfig(num_perm=128, lsh_bands=32, lsh_rows=4, shingle_size=3,
                       span_tokens=16, winnow_window=9)

    def run_pipeline():
        pipe = DedupPipeline(cfg, jaccard_threshold=0.5)
        out = pipe.run(docs, id_col="doc_id", text_col="text")
        out["clusters"].count()

    # 2. individual passes
    lsh = MinHashLSH(num_perm=128, bands=32, rows=4, shingle_size=3)

    # 3. reference 6-feature compare shape at ~5e4 pairs
    pairs = (
        Block("c_nationkey").index(cust, id_col="c_custkey").limit(50000)
    )

    def run_compare():
        feats = (
            Compare()
            .string("c_name", "c_name", "jaro", label="f_jaro")
            .string("c_name", "c_name", "jarowinkler", threshold=0.85, label="f_jw")
            .exact("c_mktsegment", "c_mktsegment", label="f_seg")
            .exact("c_nationkey", "c_nationkey", label="f_nat")
            .string("c_name", "c_name", "levenshtein", threshold=0.85, label="f_lev")
            .numeric("c_acctbal", "c_acctbal", "gauss", scale=1000.0, label="f_bal")
            .compute(pairs, cust, id_col="c_custkey")
        )
        feats.agg(F.sum("f_jaro")).collect()

    # 4. ECM on 50k binary vectors (seed 535, reference test scale)
    def run_ecm():
        feats, _ = binary_vectors(spark, n=50000, n_match=10000, random_state=535)
        ECMClassifier().fit_predict(feats).filter("label = 1").count()

    # 5. connected components over a synthetic 10-chain graph
    def run_cc():
        edges = cust.select(
            F.col("c_custkey").alias("id_1"),
            (F.col("c_custkey") - F.col("c_custkey") % 10).alias("id_2"),
        ).filter(F.col("id_1") != F.col("id_2"))
        ConnectedComponents().compute(edges).count()

    # 7. LSH embedding near-dup + its recall vs the exact all-pairs oracle
    dim = len(emb.select("embedding").first()["embedding"])
    exact_pairs = {
        (r["id_1"], r["id_2"])
        for r in ann.cosine_all_pairs(emb, threshold=0.85, id_col="vec_id").collect()
    }
    recalls: list[float] = []

    def run_lsh_neardup():
        got = ann.embedding_near_dup_pairs(
            emb, dim=dim, threshold=0.85, bits=8, tables=8
        ).collect()
        found = {(r["id_1"], r["id_2"]) for r in got}
        recalls.append(
            len(found & exact_pairs) / len(exact_pairs) if exact_pairs else 1.0
        )

    queries = [
        ("dedup_pipeline", run_pipeline),
        ("minhash_candidates",
         lambda: lsh.candidate_pairs(docs, "doc_id", "text").count()),
        ("simhash_candidates",
         lambda: SimHash(hamming_k=3, blocks=4, shingle_size=2)
         .candidate_pairs(docs, "doc_id", "text").count()),
        ("substring_pairs",
         lambda: FingerprintSubstring(span_tokens=16, winnow_window=9)
         .candidate_pairs(docs, "doc_id", "text").count()),
        ("substring_removal",
         lambda: remove_duplicate_spans(docs, "doc_id", "text",
                                        span_tokens=16, winnow_window=9)
         .filter("cut_spans > 0").count()),
        ("compare_6feat_50k", run_compare),
        ("ecm_50k", run_ecm),
        ("connected_components", run_cc),
        ("ann_topk", lambda: ann.cosine_topk(emb, emb.limit(50), k=10).count()),
        ("ann_ivf_topk",
         lambda: ann.ivf_topk(emb, emb.limit(50), k=10, n_lists=32,
                              nprobe=8, seed=42).count()),
        ("embedding_near_dup_lsh", run_lsh_neardup),
        ("semantic_dedup",
         lambda: semantic_dedup(emb, n_lists=32, threshold=0.85, seed=42)
         .filter("NOT keep").count()),
    ]

    # Round-robin best-of-N: every query sampled once per sweep so a bad
    # host minute degrades one sample of each rather than all samples of
    # one; best-of per query is then robust to any single bad sweep.
    runs: dict[str, list[float]] = {name: [] for name, _ in queries}
    for _rep in range(REPEATS):
        for name, fn in queries:
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))

    timings = {name: min(samples) for name, samples in runs.items()}

    # --- incremental vs rebuild (VERDICT r4 "Next round" #5) ---------------
    # Two-snapshot experiment at ~450k store + ~50k new docs, run ONCE
    # after the round-robin (it is minutes-scale, and the claim is a RATIO
    # whose two sides share the same host minute, so best-of-N would double
    # bench time for no robustness). Record: ingesting a new snapshot via
    # run_incremental (crawl-vs-store: the corpus is touched only through
    # its persisted signature store) vs re-running the full pipeline over
    # old ∪ new, at equal planted-dup recall. Skip with
    # SPARK_GRAFT_BENCH_INCR=0.
    incremental = None
    if os.environ.get("SPARK_GRAFT_BENCH_INCR", "1") != "0":
        from recordlinkage_spark import measures
        from recordlinkage_spark.datagen import webtext_corpus_distributed

        n_total = int(os.environ.get("SPARK_GRAFT_BENCH_INCR_DOCS", "500000"))
        # doc_tokens (150, 500): real web pages carry ~2 KB of extracted
        # text, and the cost incremental ingest avoids is re-SIGNING the
        # store's text — the default tiny test docs (40-160 tokens) make
        # signing a rounding error and understate the ratio
        corpus, truth = webtext_corpus_distributed(
            spark, n_docs=n_total, dup_fraction=0.3, seed=42,
            partitions=slots * 2, doc_tokens=(150, 500),
        )
        corpus = corpus.select("doc_id", "url", "text").cache()
        n_corpus = corpus.count()
        # deterministic ~10% "new snapshot" slice (hash split, like the
        # equivalence gate in tests/test_incremental_flow.py) — the
        # operational shape run_incremental exists for: every snapshot is
        # small next to the store. The two full store scans the local run
        # still pays (bands + fps explode over the pinned signature
        # frame) are partition-pruned at scale when the store is an
        # Iceberg table bucketed on band_key.
        is_new = F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(10)) == 0
        base_docs = corpus.filter(~is_new)
        new_docs = corpus.filter(is_new).cache()
        n_new = new_docs.count()

        t0 = time.time()
        full_out = DedupPipeline(cfg, jaccard_threshold=0.5).run(
            corpus, id_col="doc_id", text_col="text")
        full_out["clusters"].count()
        rebuild_secs = round(time.time() - t0, 3)

        # store build: amortized once per corpus lifetime, timed for
        # transparency but NOT part of the per-snapshot cost
        t0 = time.time()
        base_out = DedupPipeline(cfg, jaccard_threshold=0.5).run(
            base_docs, id_col="doc_id", text_col="text")
        base_out["clusters"].count()
        store_secs = round(time.time() - t0, 3)

        t0 = time.time()
        inc_out = DedupPipeline(cfg, jaccard_threshold=0.5).run_incremental(
            new_docs, base_out["signatures"], base_out["clusters"],
            id_col="doc_id", text_col="text")
        inc_out["clusters"].count()
        inc_secs = round(time.time() - t0, 3)

        t_pairs = truth.filter(F.col("kind").isin(["exact", "near"])).select(
            F.col("url_1").alias("id_1"), F.col("url_2").alias("id_2"))
        id_map = corpus.select("doc_id", "url")

        def _recall(clusters):
            c = clusters.join(id_map, "doc_id").select(
                F.col("url").alias("id"), "cluster_id")
            return round(measures.cluster_pair_recall(t_pairs, c, id_col="id"), 5)

        incremental = {
            "n_store": n_corpus - n_new,
            "n_new": n_new,
            "rebuild_secs": rebuild_secs,
            "store_build_secs": store_secs,
            "incremental_secs": inc_secs,
            "speedup_vs_rebuild": round(rebuild_secs / inc_secs, 2),
            "recall_rebuild": _recall(full_out["clusters"]),
            "recall_incremental": _recall(inc_out["clusters"]),
        }
    # Stop Spark BEFORE the post-probe: a worked JVM — even one sitting
    # idle after its last job — costs the probe child ~5x (measured
    # 385k vs 2.1M rows/s seconds apart, the only variable being
    # spark.stop()); probing past it mislabeled four healthy windows as
    # degraded. The probe measures the HOST, so nothing of ours may be
    # running.
    spark.stop()
    post_probe = scan_probe() if RUN_PROBE else {"skipped": True, "healthy": None}
    # An unhealthy post-probe right after minutes of heavy Spark work is
    # usually the tail of our own load settling (page-cache/IO churn from
    # the just-deleted shuffle dirs), not a closed host window — controls
    # show pure CPU and pure DRAM burns leave the probe healthy while the
    # long bench transiently depresses it, recovering within a minute.
    # Distinguish the two honestly: retry ONCE after a settle pause and
    # record both readings; degraded only if the retry also fails.
    post_probe_retry = None
    if RUN_PROBE and not post_probe.get("healthy"):
        time.sleep(75)
        post_probe_retry = scan_probe()

    post_ok = post_probe.get("healthy") or (
        post_probe_retry is not None and post_probe_retry.get("healthy")
    )
    degraded = RUN_PROBE and not (pre_probe.get("healthy") and post_ok)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "dedup_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "docs_per_sec_dedup": round(n_docs / timings["dedup_pipeline"], 1),
        "lsh_neardup_recall": round(min(recalls), 4) if recalls else None,
        "incremental": incremental,
        "cpus": cpus,
        "task_slots": slots,
        "repeats": REPEATS,
        "runs": runs,
        "probe_pre": pre_probe,
        "probe_post": post_probe,
        "probe_post_retry": post_probe_retry,
        "probe_quiet_archive_rows_per_sec": QUIET_SCAN_ROWS_PER_SEC,
        "host_degraded": degraded,
    }))


if __name__ == "__main__":
    main()
