"""The reference's comparing workload at asv scale (VERDICT r2 #5).

Mirrors ``reference/benchmarks/bench_comparing.py:6-111``: the SAME
6-feature global compare (jaro, jaro-winkler@0.85, date, exact suburb,
exact state, levenshtein@0.85) over Full-index pairs of a FEBRL-shaped
person corpus, at 5e3 / 5e4 / 5e5 / 5e6 pairs. Reports pairs/sec per
size so kernel cost (the per-pair Python share, esp. jaro/damerau) shows
up directly as sub-linear scaling.

Usage: python scripts/compare_scale_bench.py [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from pyspark.sql import functions as F

    from recordlinkage_spark.comparing import Compare
    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.datagen import person_corpus

    spark = get_spark("compare-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    # ~5000 records -> 12.5M full-index pairs, enough to slice 5e6
    people = person_corpus(spark, n_originals=2000, seed=42).withColumn(
        # FEBRL-style yyyymmdd strings; corrupted dups may be unparseable
        "date_of_birth",
        F.expr("try_to_date(date_of_birth, 'yyyyMMdd')"),
    ).cache()
    n = people.count()
    a = people.select(F.col("rec_id").alias("id_1"))
    b = people.select(F.col("rec_id").alias("id_2"))
    all_pairs = a.crossJoin(b).filter(F.col("id_1") > F.col("id_2"))

    def features(pairs):
        return (
            Compare()
            .string("given_name", "given_name", "jaro", label="f_gn")
            .string("surname", "surname", "jarowinkler", threshold=0.85,
                    label="f_sn")
            .date("date_of_birth", "date_of_birth", label="f_dob")
            .exact("suburb", "suburb", label="f_sub")
            .exact("state", "state", label="f_state")
            .string("address_1", "address_1", "levenshtein", threshold=0.85,
                    label="f_addr")
            .compute(pairs, people, id_col="rec_id")
        )

    results = {}
    for size in (5_000, 50_000, 500_000, 5_000_000):
        pairs = all_pairs.limit(size).repartition(cpus * 2).cache()
        got = pairs.count()
        feats = features(pairs)
        feats.agg(F.sum("f_gn")).collect()  # warm (plan + python workers)
        t0 = time.time()
        feats.agg(*[F.sum(c).alias(c) for c in
                    ["f_gn", "f_sn", "f_dob", "f_sub", "f_state", "f_addr"]]
                  ).collect()
        secs = time.time() - t0
        results[f"pairs_{size}"] = {
            "pairs": got, "secs": round(secs, 2),
            "pairs_per_sec": round(got / secs, 1),
        }
        print(json.dumps(results[f"pairs_{size}"] | {"size": size}), flush=True)
        pairs.unpersist()
    print(json.dumps({"records": n, "cpus": cpus, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
