"""Per-stage wall-time profile of DedupPipeline at a given local[N]."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(cpus: int, n_docs: int) -> None:
    from recordlinkage_spark.config import EngineConfig, get_spark
    from recordlinkage_spark.datagen import webtext_corpus_distributed
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
    docs = docs.cache()
    docs.count()
    t_gen = time.time() - t_gen0

    warm = F.pandas_udf(lambda s: s.str.len().astype("int64"), LongType())
    for _ in range(2):
        docs.select(warm(F.col("text")).alias("n")).agg(F.sum("n")).collect()

    cfg = EngineConfig(num_perm=128, lsh_bands=32, lsh_rows=4, shingle_size=3)
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
        "stages": pipe.metrics,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
