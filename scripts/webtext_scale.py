"""Webtext corpus-hygiene ops at-scale evidence run (round 4).

Drives the four round-4 hygiene passes over the deterministic 2M-doc
control corpus (/tmp/scaling_control_data, built on first use by
scripts/scaling_control.py) and appends a probe-bracketed record to
BENCH/WEBTEXT_SCALE.json:

  - gopher_quality_features: full feature projection (8-token pseudo-line
    chunking identical to the driver query), forced by summing every
    feature — zero-shuffle, so its docs/sec is the pure scan+project rate
  - redact_pii: regexp chain + counts (corpus has no planted PII; the
    regex scan cost is identical either way)
  - line_dedup: chunked pseudo-lines, corpus-level duplicated-line drop
  - decontaminate: every 2000th doc as the benchmark (1000 docs), n=13,
    hashed keys (the production path)

Each op reports wall seconds and docs/sec; the dedup/decontaminate ops
also report their headline aggregate so the run is self-describing.

Usage:
  python scripts/webtext_scale.py [slots]
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

    from recordlinkage_spark import webtext
    from recordlinkage_spark.config import get_spark

    if not (DATA / "_SUCCESS").exists():
        sys.path.insert(0, str(REPO / "scripts"))
        import scaling_control

        scaling_control.gen(2_000_000)

    pre = probe()
    spark = get_spark("webtext-scale", master=f"local[{slots}]",
                      shuffle_partitions=max(2 * slots, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(DATA)).cache()
    n_docs = docs.count()

    # 8-token pseudo-line chunking, identical to the driver queries
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nlines = F.ceil(F.size(toks) / F.lit(8)).cast("int")
    chunked = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nlines - 1),
                lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            ),
            "\n",
        ).alias("text"),
    )

    results: dict[str, dict] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        extra = fn()
        secs = round(time.time() - t0, 2)
        results[name] = {
            "secs": secs, "docs_per_sec": round(n_docs / secs, 1),
            **(extra or {}),
        }
        print(f"{name}: {secs}s ({results[name]['docs_per_sec']} docs/s) "
              f"{extra or ''}", flush=True)

    def run_gopher():
        feats = webtext.gopher_quality_features(F.col("text"))
        row = chunked.agg(
            *[F.sum(c).alias(k) for k, c in feats.items() if k != "n_lines"],
            F.sum(feats["n_lines"]).alias("n_lines"),
        ).collect()[0]
        return {"mean_dup_line_frac": round(
            row["dup_line_frac"] / n_docs, 6)}

    def run_redact():
        r = webtext.redact_pii(F.col("text"))
        row = docs.agg(
            F.sum(F.length(r["text_redacted"])).alias("chars"),
            F.sum(r["n_emails"] + r["n_ipv4"] + r["n_phones"]).alias("hits"),
        ).collect()[0]
        return {"pii_hits": int(row["hits"])}

    def run_line_dedup():
        out = webtext.line_dedup(chunked, "doc_id", "text")
        row = out.agg(
            F.count("*").alias("n"),
            F.sum("chars_removed").alias("chars_removed"),
            F.sum("n_removed").alias("lines_removed"),
        ).collect()[0]
        return {"lines_removed": int(row["lines_removed"]),
                "chars_removed": int(row["chars_removed"])}

    def run_decontaminate():
        bench = docs.filter(F.col("doc_id") % 2000 == 0)
        out = webtext.decontaminate(docs, bench, n=13, use_hash=True)
        row = out.agg(
            F.sum(F.col("contaminated").cast("int")).alias("flagged")
        ).collect()[0]
        return {"flagged_docs": int(row["flagged"])}

    run("gopher_quality", run_gopher)
    run("redact_pii", run_redact)
    run("line_dedup", run_line_dedup)
    run("decontaminate", run_decontaminate)
    spark.stop()
    post = probe()

    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": n_docs,
        "slots": slots,
        "ops": results,
        "probe_pre": pre,
        "probe_post": post,
        "host_degraded": not (pre.get("healthy") and post.get("healthy")),
    }
    out_path = REPO / "BENCH" / "WEBTEXT_SCALE.json"
    records = (
        json.loads(out_path.read_text()) if out_path.exists() else []
    )
    records.append(record)
    out_path.write_text(json.dumps(records, indent=1))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
