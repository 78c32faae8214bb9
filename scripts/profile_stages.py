"""Per-stage wall-time profile of DedupPipeline at a given local[N]."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(cpus: int, n_docs: int, boiler_pct: int = 0) -> None:
    """boiler_pct > 0 plants the tests/test_skew_demo.py boilerplate
    hazard at scale: a shared 600-token header on boiler_pct% of docs
    (deterministic carrier set) with max_bucket_size=200, to demonstrate
    the dropped-bucket accumulators firing and clean-pair recall holding
    at sf1 scale. Recall is then computed over pairs NOT touching a
    carrier (the cap sheds degenerate buckets by design)."""
    import numpy as np

    from recordlinkage_spark.config import EngineConfig, get_spark
    from recordlinkage_spark.datagen import VOCAB, webtext_corpus_distributed
    from recordlinkage_spark.pipeline import DedupPipeline
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType
    import pandas as pd  # noqa: F401

    spark = get_spark(f"profile-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    t_gen0 = time.time()
    docs, truth = webtext_corpus_distributed(
        spark, n_docs=n_docs, dup_fraction=0.3, seed=42, partitions=cpus * 2
    )
    if boiler_pct > 0:
        rng = np.random.RandomState(2024)
        header = " ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), 600))
        is_boiler = (
            F.pmod(F.abs(F.hash(F.col("url"))), F.lit(100)) < boiler_pct
        )
        docs = docs.withColumn(
            "text",
            F.when(is_boiler, F.concat(F.lit(header + " "), F.col("text")))
            .otherwise(F.col("text")),
        ).withColumn("is_boiler", is_boiler)
    docs = docs.cache()
    docs.count()
    t_gen = time.time() - t_gen0

    warm = F.pandas_udf(lambda s: s.str.len().astype("int64"), LongType())
    for _ in range(2):
        docs.select(warm(F.col("text")).alias("n")).agg(F.sum("n")).collect()

    # boiler runs: bucket cap 200 (drops the degenerate mega-buckets) +
    # verify-degree cap 8 (bounds the verify gather over the TRUE
    # boilerplate clique — sub-cap buckets alone emitted 27.8M pairs /
    # 904 s verify / ~24 GB spill at 2M docs, quadratic in clique size;
    # dense components survive, rare bridge-only components can split —
    # measured 0.002% of docs, recall stays in-gate; see
    # minhash.cap_pair_degree)
    cfg = EngineConfig(
        num_perm=128, lsh_bands=32, lsh_rows=4, shingle_size=3,
        **({"max_bucket_size": 200, "max_verify_degree": 8}
           if boiler_pct else {}),
    )
    t0 = time.time()
    pipe = DedupPipeline(cfg, jaccard_threshold=0.5)
    out = pipe.run(docs, id_col="doc_id", text_col="text")
    out["clusters"].count()
    secs = time.time() - t0

    # planted-dup recall + dropped-bucket accumulators (r4: the sf1-scale
    # stage-breakdown record in BENCH/BASELINE.md needs both)
    from recordlinkage_spark import measures

    t = truth.filter(F.col("kind").isin(["exact", "near"])).select(
        F.col("url_1").alias("id_1"), F.col("url_2").alias("id_2")
    )
    if boiler_pct > 0:
        carriers = docs.filter("is_boiler").select(F.col("url").alias("_u"))
        t = (
            t.join(carriers, t.id_1 == carriers._u, "left_anti")
            .join(carriers, t.id_2 == carriers._u, "left_anti")
        )
    id_map = docs.select("doc_id", "url")
    clusters = out["clusters"].join(id_map, "doc_id").select(
        F.col("url").alias("id"), "cluster_id"
    )
    rec = measures.cluster_pair_recall(t, clusters, id_col="id")
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "gen_secs": round(t_gen, 1),
        "total_secs": round(secs, 2),
        "docs_per_sec": round(n_docs / secs, 1),
        "dup_pair_recall": round(rec, 5),
        "boiler_pct": boiler_pct,
        "stages": pipe.metrics,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 0)
