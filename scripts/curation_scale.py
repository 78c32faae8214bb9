"""Curation-operator at-scale evidence run (round 4, session 3).

Drives the round-4 curation chain over the deterministic 2M-doc control
corpus (/tmp/scaling_control_data, built on first use by
scripts/scaling_control.py) and appends a probe-bracketed record to
BENCH/CURATION_SCALE.json:

  - filter_urls: scheme/host-suffix/pattern blocklist over a synthesized
    URL column (1/11 bad scheme, 1/7 blocked-domain subdomain, 1/5
    session pattern — the driver query's shape at 2M rows), literal
    blocklist so the op is a single codegen'd filter
  - corpus_stats: the one-aggregation corpus health row
  - unigram_logprob: fit the 65536-token vocab on the full corpus and
    score every doc (two corpus passes + broadcast vocab join — the
    most expensive new op)
  - select_by_budget (threshold): keep the best-LM-scored half of the
    corpus token mass via the histogram-threshold scale path
  - cap_per_group: at most 1000 docs per synthesized host (97 hosts ->
    every group is a mega-group; exercises the partial WindowGroupLimit)
  - pack_sequences: 2048-token packs over 256 shards (ONE exchange)
  - bloom_dedup: incremental dedup of a simulated 1M-row new snapshot
    (half verbatim recrawls, half edited) against the 2M-doc corpus on
    md5 fingerprints — bloom build scan + broadcast probe + exact rescue
  - incremental_pipeline: DedupPipeline.run_incremental of a 1/3-corpus
    snapshot against the 2/3-corpus base signature store (base run is an
    untimed setup hook — it is the prior month's persisted output at
    scale); timed = snapshot signatures + pairing vs store + verify +
    merge-only CC

Each op reports wall seconds and docs/sec plus a self-describing
aggregate. Usage:

  python scripts/curation_scale.py [slots] [op1,op2,...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUIET_SCAN_ROWS_PER_SEC = 1_577_548.8  # BENCH/CONTROLS.json scan.local4
HEALTH_FACTOR = 1.5
DATA = Path("/tmp/scaling_control_data")


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scaling_control.py"),
         "--child", "scan", "4"],
        capture_output=True, text=True, cwd=str(REPO), timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            res["healthy"] = (
                res["rows_per_sec"] >= QUIET_SCAN_ROWS_PER_SEC / HEALTH_FACTOR
            )
            return res
    return {"error": (out.stdout[-200:] + out.stderr[-200:]).strip(),
            "healthy": False}


def main() -> None:
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from pyspark.sql import functions as F

    from recordlinkage_spark import sharding, textfns, webtext
    from recordlinkage_spark.config import get_spark

    if not (DATA / "_SUCCESS").exists():
        sys.path.insert(0, str(REPO / "scripts"))
        import scaling_control

        scaling_control.gen(2_000_000)

    pre = probe()
    spark = get_spark("curation-scale", master=f"local[{slots}]",
                      shuffle_partitions=max(2 * slots, 16))
    spark.sparkContext.setLogLevel("ERROR")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 11 == 0, F.lit("ftp://")).otherwise(F.lit("https://")),
        F.when(d % 7 == 0, F.lit("crawl.h")).otherwise(F.lit("h")),
        (d % 97).cast("string"),
        F.when(d % 7 == 0, F.lit(".spam.example")).otherwise(
            F.lit(".example.org")),
        F.lit("/doc/"), d.cast("string"),
        F.when(d % 5 == 0, F.lit("?session=x")).otherwise(F.lit("")),
    )
    docs = (
        # The control corpus is written as 6 parquet files, which caps
        # scan-side task parallelism at 6 regardless of slots — a layout
        # artifact a 100 TB corpus (millions of files) does not have.
        # Repartition to a FIXED 64 (same at every parallelism level, so
        # the input to the timed ops is identical) before caching; the
        # exchange happens once inside the untimed cache materialization.
        spark.read.parquet(str(DATA))
        .repartition(64)
        .withColumn("url", url)
        .withColumn("host", webtext.url_host(F.col("url")))
        .withColumn("n_tokens", F.size(textfns.tokens(F.col("text"))))
        .cache()
    )
    n_docs = docs.count()

    results: dict[str, dict] = {}

    def run(name: str, fn, repeats: int = 2) -> None:
        # bench.py protocol: the probe bracket cannot see a contended
        # stretch INSIDE the run, so take best-of-N per op (ops are
        # deterministic; the min is the least-contended sample) and
        # keep every rep in the record
        reps = []
        extra = None
        for _ in range(repeats):
            t0 = time.time()
            extra = fn()
            reps.append(round(time.time() - t0, 2))
        secs = min(reps)
        results[name] = {
            "secs": secs, "docs_per_sec": round(n_docs / secs, 1),
            "reps": reps,
            **(extra or {}),
        }
        print(f"{name}: {secs}s best-of {reps} "
              f"({results[name]['docs_per_sec']} docs/s) {extra or ''}",
              flush=True)

    def run_filter_urls():
        out = webtext.filter_urls(
            docs, "url", blocked_hosts=["spam.example"],
            blocked_url_patterns=[r"\?session="], reason_col="why",
        )
        rows = out.groupBy("why").count().collect()
        return {"by_reason": {str(r["why"]): int(r["count"]) for r in rows}}

    def run_url_recrawl_dedup():
        # two crawls per doc (2x the corpus as input rows): keep-latest
        # must collapse back to n_docs via ONE map-side-combinable hash
        # aggregate on the canonical url, carrying the full text payload.
        crawls = docs.select(
            "doc_id", "url", "text",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("crawl"),
        ).withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(1700000000) + d + F.col("crawl") * 3600
            ),
        )
        out = webtext.dedup_url_keep_latest(crawls)
        row = out.agg(F.count("*").alias("n"),
                      F.sum("n_crawls").alias("c")).collect()[0]
        return {"kept": int(row["n"]), "collapsed_from": int(row["c"])}

    def run_corpus_stats():
        row = textfns.corpus_stats(docs, "text").collect()[0]
        return {"exact_dup_rate": float(row["exact_dup_rate"]),
                "total_tokens": int(row["total_tokens"])}

    def run_unigram_logprob():
        out = textfns.unigram_logprob(docs, "doc_id", "text",
                                      vocab_size=65536, add_k=0.5)
        row = out.agg(F.avg("mean_logprob").alias("m"),
                      F.count("*").alias("n")).collect()[0]
        return {"corpus_mean_logprob": round(float(row["m"]), 4)}

    def run_select_by_budget():
        scored = docs.withColumn(
            "q", F.round(F.col("n_tokens") / (F.length("text") + 1), 6)
        )
        total = scored.agg(F.sum("n_tokens")).collect()[0][0]
        out = sharding.select_by_budget(
            scored, "doc_id", "q", "n_tokens", budget=int(total) // 2,
            mode="threshold",
        )
        kept = out.agg(F.count("*").alias("n"),
                       F.sum("n_tokens").alias("t")).collect()[0]
        return {"kept_docs": int(kept["n"]),
                "kept_token_frac": round(int(kept["t"]) / int(total), 4)}

    def run_cap_per_group():
        out = sharding.cap_per_group(
            docs, "host", "doc_id", cap=1000, order_col="n_tokens",
        )
        return {"kept_docs": int(out.count())}

    def run_pack_sequences():
        out = sharding.pack_sequences(
            docs, "doc_id", "n_tokens", budget=2048, n_shards=256,
        )
        row = out.agg(
            (F.max(F.struct("shard", "pack_id"))["pack_id"]).alias("_"),
            F.countDistinct("shard").alias("shards"),
            F.sum(F.col("spans_boundary").cast("long")).alias("spanning"),
            F.countDistinct("shard", "pack_id").alias("packs"),
        ).collect()[0]
        return {"n_packs": int(row["packs"]),
                "spanning_docs": int(row["spanning"])}

    def run_dedup_lines_in_doc():
        # corpus text has no newlines; chunk to 8-token pseudo-lines
        # first (the driver query's shape), then the pure-projection
        # in-doc dedup — measures chunk + dedup + the summary aggregate.
        # Chunk with ONE regex pass (every 8th token separator -> \n),
        # not the driver query's transform/slice expression: that form
        # re-evaluates the captured token array per transform element
        # (fine at oracle scale, a multiplicative expression blowup when
        # inlined under the dedup fold at 2M docs). Identical output on
        # this corpus's single-space-separated text.
        pseudo = F.regexp_replace(
            F.trim(F.col("text")), r"((?:\S+\s+){7}\S+)\s+", "$1\n"
        )
        # plant one within-doc repeat per doc (the driver query's shape:
        # first pseudo-line appended twice) so the removal branch of the
        # fold does real work on every row
        first = F.element_at(F.split(pseudo, r"\n", -1), 1)
        planted = F.concat_ws("\n", pseudo, first, first)
        d = webtext.dedup_lines_within_doc(planted)
        row = docs.select(
            d["n_removed"].alias("r"), d["chars_removed"].alias("c")
        ).agg(F.sum("r").alias("r"), F.sum("c").alias("c")).collect()[0]
        return {"lines_removed": int(row["r"]),
                "chars_removed": int(row["c"])}

    def run_span_removal():
        from recordlinkage_spark.suffix import remove_duplicate_spans

        out = remove_duplicate_spans(
            docs, "doc_id", "text", span_tokens=32, winnow_window=19,
        )
        row = out.agg(
            F.sum((F.col("cut_spans") > 0).cast("long")).alias("d"),
            F.sum("cut_tokens").alias("t"),
        ).collect()[0]
        return {"affected_docs": int(row["d"] or 0),
                "cut_tokens": int(row["t"] or 0)}

    def run_bloom_dedup():
        # incremental dedup of a simulated NEW snapshot (half the corpus:
        # one quarter verbatim recrawls, one quarter edited) against the
        # full 2M-doc corpus. Keys are md5 fingerprints (the realistic
        # key at scale — a raw-text key would make the rescue broadcast
        # carry full documents). Timed work = fingerprinting 3M rows
        # JVM-side + bloom build scan + probe + exact rescue.
        from recordlinkage_spark.bloom import dedup_against

        new = docs.filter(d % 4 < 2).select(
            (d + 10_000_000).alias("doc_id"),
            F.md5(
                F.when(d % 4 == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" r4")))
            ).alias("fp"),
        )
        n_new = new.count()
        out = dedup_against(
            new, docs.select(F.md5("text").alias("fp")), "fp",
            expected_items=n_docs, fpp=0.01,
        )
        kept = out.count()
        return {"new_rows": int(n_new), "survivors": int(kept),
                "dropped_as_dup": int(n_new - kept)}

    # --- incremental snapshot ingest (DedupPipeline.run_incremental) ----
    # Base store (2/3 of the corpus run through the full pipeline) is the
    # PRIOR month's persisted output at scale, so it is built in an
    # UNTIMED setup hook; the timed op is what a monthly ingest pays:
    # snapshot signature pass + within/vs-store pairing (LSH bands +
    # winnowing fps, store semi-joined to touched keys) + verify +
    # merge-only CC over prior assignments ∪ new matches.
    from recordlinkage_spark.config import EngineConfig
    from recordlinkage_spark.pipeline import DedupPipeline

    incr_cfg = EngineConfig(num_perm=128, lsh_bands=32, lsh_rows=4,
                            shingle_size=3, span_tokens=16, winnow_window=9)
    incr_state: dict = {}

    def setup_incremental_base():
        if incr_state:
            return
        base_df = docs.filter(d % 3 != 0).select("doc_id", "text")
        t0 = time.time()
        bout = DedupPipeline(incr_cfg, jaccard_threshold=0.5).run(
            base_df, id_col="doc_id", text_col="text")
        incr_state["sigs"] = bout["signatures"]
        incr_state["clusters"] = bout["clusters"]
        print(f"incremental base store built (untimed): "
              f"{round(time.time() - t0, 1)}s", flush=True)

    def run_incremental_pipeline():
        new_df = docs.filter(d % 3 == 0).select("doc_id", "text")
        inc = DedupPipeline(incr_cfg, jaccard_threshold=0.5)
        out = inc.run_incremental(
            new_df, incr_state["sigs"], incr_state["clusters"],
            id_col="doc_id", text_col="text",
        )
        return {"snapshot_rows": int(new_df.count()),
                "matches": int(out["matches"].count()),
                "clustered_docs": int(out["clusters"].count())}

    all_ops = [
        ("filter_urls", run_filter_urls),
        ("url_recrawl_dedup", run_url_recrawl_dedup),
        ("bloom_dedup", run_bloom_dedup),
        ("incremental_pipeline", run_incremental_pipeline,
         setup_incremental_base),
        ("span_removal", run_span_removal),
        ("dedup_lines_in_doc", run_dedup_lines_in_doc),
        ("corpus_stats", run_corpus_stats),
        ("unigram_logprob", run_unigram_logprob),
        ("select_by_budget", run_select_by_budget),
        ("cap_per_group", run_cap_per_group),
        ("pack_sequences", run_pack_sequences),
    ]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, fn, *setup in all_ops:
        if only is None or name in only:
            for s in setup:
                s()
            run(name, fn)
    spark.stop()
    post = probe()
    # bench.py protocol: a post-probe right after spark.stop() can catch
    # our own JVM draining, not a closed host window — retry ONCE after a
    # settle pause and record both readings; degraded only if both fail.
    post_retry = None
    if not post.get("healthy"):
        time.sleep(75)
        post_retry = probe()
    post_ok = post.get("healthy") or (
        post_retry is not None and post_retry.get("healthy")
    )

    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": n_docs,
        "slots": slots,
        "layout": "repartition64",  # records before 2026-08-19T09:23Z
        # ran on the control corpus's native 6-file layout, which caps
        # scan-side parallelism at 6 tasks and flattens the cheap ops

        "ops": results,
        "ops_filter": sorted(only) if only else None,
        "probe_pre": pre,
        "probe_post": post,
        "probe_post_retry": post_retry,
        "host_degraded": not (pre.get("healthy") and post_ok),
    }
    out_path = REPO / "BENCH" / "CURATION_SCALE.json"
    records = (
        json.loads(out_path.read_text()) if out_path.exists() else []
    )
    records.append(record)
    out_path.write_text(json.dumps(records, indent=1))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
