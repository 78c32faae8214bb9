"""Control experiments backing the scaling-efficiency analysis.

The dedup pipeline measured ~0.5 N->4N efficiency on this single shared
box (BENCH/BASELINE.md). The host-ceiling claim is: on ONE box, adding
cores does not add memory bandwidth, so ANY bandwidth-bound job caps
near 0.5 here, while a compute-bound job reaches ~0.8 — and a real
N->4N executor CLUSTER multiplies bandwidth with cores. These controls
measure exactly that, with the same interleaved fresh-JVM protocol as
scaling_bench.py:

- ``scan``: page-cache-resident parquet scan + sum(octet_length(text)),
  repeated SCAN_LOOPS times per measurement — pure JVM columnar read,
  zero Python, memory-bandwidth-bound by construction.
- ``cpu``: a fixed pool of Spark tasks each running a cache-resident
  uint64 multiply-xor loop over a 64 KB array inside mapInPandas —
  compute-bound by construction (no DRAM traffic, no allocation churn),
  through the full Spark scheduler/Python-worker machinery. (A first
  attempt used a JVM sha2-chain expression; its per-row string
  allocation made it allocation-bandwidth-bound and it scaled as badly
  as the scan — the kernel must be cache-resident to isolate CPU.)

Usage:
    python scripts/scaling_control.py [n_docs] [repeats] [n_lo] [n_hi]
    python scripts/scaling_control.py --child <mode> <cpus> <data_dir>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/scaling_control_data")
SCAN_LOOPS = 8
CPU_TASKS = 128    # fixed task pool; ~equal work each
CPU_ITERS = 40000  # mul-xor sweeps of the 64KB array per task-row (~1s)


def gen(n_docs: int) -> None:
    sys.path.insert(0, str(REPO))
    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.datagen import webtext_corpus_distributed

    if (DATA / "_SUCCESS").exists():
        return
    spark = get_spark("control-gen", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs, _ = webtext_corpus_distributed(
        spark, n_docs=n_docs, dup_fraction=0.3, seed=42, partitions=64
    )
    docs.select("doc_id", "text").write.mode("overwrite").parquet(str(DATA))
    spark.stop()


def child(mode: str, cpus: int) -> None:
    sys.path.insert(0, str(REPO))
    from recordlinkage_spark.config import get_spark
    from pyspark.sql import functions as F

    # Self-sufficient when invoked standalone (bench.py's probe calls the
    # scan child directly): build the control corpus if it isn't there yet.
    if not (DATA / "_SUCCESS").exists():
        gen(2_000_000)

    spark = get_spark(f"control-{mode}-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "scan":
        df = spark.read.parquet(str(DATA))
        # warm: one untimed scan primes the page cache + JVM JIT
        df.agg(F.sum(F.octet_length("text"))).collect()
        expr = F.sum(F.octet_length("text"))
        t0 = time.time()
        for _ in range(SCAN_LOOPS):
            df.agg(expr).collect()
        secs = time.time() - t0
        n = df.count() * SCAN_LOOPS
    else:
        # cpu: CPU_TASKS tasks x a cache-resident uint64 mul-xor loop
        # over a 64KB array (zero DRAM pressure), via mapInPandas
        import pandas as pd  # noqa: F401

        def kernel(batches):
            import numpy as np
            x = np.arange(8192, dtype=np.uint64)
            total = 0
            for pdf in batches:
                total += len(pdf)
                np.seterr(over="ignore")
                for _ in range(CPU_ITERS * len(pdf)):
                    x = x * np.uint64(0x9E3779B97F4A7C15) ^ (x >> np.uint64(31))
            yield __import__("pandas").DataFrame({"n": [int(x[0]) + total]})

        base = spark.range(CPU_TASKS).repartition(CPU_TASKS)
        # warm the Python workers untimed
        base.mapInPandas(kernel, "n long").count()
        t0 = time.time()
        for _ in range(2):
            base.mapInPandas(kernel, "n long").count()
        secs = time.time() - t0
        n = CPU_TASKS * CPU_ITERS * 2  # "rows" = kernel iterations

    print(json.dumps({
        "mode": mode, "cpus": cpus,
        "secs": round(secs, 2),
        "rows_per_sec": round(n / secs, 1),
    }))
    spark.stop()


def run_child(mode: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", mode, str(cpus)],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    gen(n_docs)
    runs: dict[tuple[str, int], list[dict]] = {}
    for r in range(repeats):
        for mode in ("scan", "cpu"):
            for cpus in (n_lo, n_hi):
                res = run_child(mode, cpus)
                runs.setdefault((mode, cpus), []).append(res)
                print(f"round {r}: {mode} local[{cpus}] -> "
                      f"{res['rows_per_sec']} rows/s ({res['secs']}s)",
                      flush=True)
    report = {}
    ratio = n_hi // n_lo
    for mode in ("scan", "cpu"):
        lo = max(runs[(mode, n_lo)], key=lambda x: x["rows_per_sec"])
        hi = max(runs[(mode, n_hi)], key=lambda x: x["rows_per_sec"])
        report[mode] = {
            f"local{n_lo}": lo, f"local{n_hi}": hi,
            "all_lo": [x["rows_per_sec"] for x in runs[(mode, n_lo)]],
            "all_hi": [x["rows_per_sec"] for x in runs[(mode, n_hi)]],
            "scaling_efficiency": round(
                hi["rows_per_sec"] / (ratio * lo["rows_per_sec"]), 3
            ),
        }
    print(json.dumps(report, indent=2))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "CONTROLS.json").write_text(json.dumps(report, indent=2))
    print(f"wrote {REPO / 'BENCH' / 'CONTROLS.json'}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
