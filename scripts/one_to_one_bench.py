"""OneToOneLinking at scale: hybrid wave+driver vs pure driver path.

Generates a realistic score-ordered pair set (~n_pairs candidate pairs
over n_ids records, seq = similarity rank as a dedup pipeline would
produce), then measures:

  - driver:  exact vectorized greedy (threshold > n_pairs)
  - hybrid:  distributed waves until remaining <= tail_threshold, then
             the driver finishes the tail (the production path when the
             pair list exceeds driver memory)

and asserts both produce the identical matching. Round count of the
distributed phase is reported — the wavefront tail is where round-1's
~1400 Spark stages went.

Usage: python scripts/one_to_one_bench.py [n_pairs] [n_ids] [tail_threshold]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_ids = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    tail = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000

    from pyspark.sql import functions as F

    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.network import OneToOneLinking

    spark = get_spark("one2one-bench", master="local[16]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # score-ordered candidate pairs: random endpoints, seq already sorted
    # by descending similarity (i.e. ascending seq = greedy order)
    pairs = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.hash(F.col("id") * 2654435761), F.lit(n_ids)).alias("id_1"),
            F.pmod(F.hash(F.col("id") * 40503 + 7), F.lit(n_ids)).alias("id_2"),
            F.col("id").alias("seq"),
        )
        .filter(F.col("id_1") != F.col("id_2"))
        .persist()
    )
    n = pairs.count()
    print(f"pairs: {n}", flush=True)

    t0 = time.time()
    drv = OneToOneLinking(driver_threshold=n + 1).compute(pairs).persist()
    n_drv = drv.count()
    t_drv = time.time() - t0
    print(f"driver: {n_drv} kept in {t_drv:.1f}s", flush=True)

    t0 = time.time()
    hyb = OneToOneLinking(driver_threshold=tail).compute(pairs).persist()
    n_hyb = hyb.count()
    t_hyb = time.time() - t0
    print(f"hybrid: {n_hyb} kept in {t_hyb:.1f}s", flush=True)

    mismatch = drv.select("id_1", "id_2").exceptAll(
        hyb.select("id_1", "id_2")
    ).count() + hyb.select("id_1", "id_2").exceptAll(
        drv.select("id_1", "id_2")
    ).count()
    print(json.dumps({
        "n_pairs": n, "n_ids": n_ids, "tail_threshold": tail,
        "driver_secs": round(t_drv, 1), "hybrid_secs": round(t_hyb, 1),
        "kept": n_drv, "identical": mismatch == 0,
        "hybrid_over_driver": round(t_hyb / t_drv, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
