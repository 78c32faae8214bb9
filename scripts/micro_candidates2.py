"""Micro-bench candidate_pairs internals with the fused kernels."""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(cpus: int, n_docs: int) -> None:
    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.datagen import webtext_corpus_distributed
    from recordlinkage_spark.minhash import MinHashLSH
    from pyspark.sql import functions as F

    spark = get_spark(f"micro2-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs, _ = webtext_corpus_distributed(
        spark, n_docs=n_docs, dup_fraction=0.3, seed=42, partitions=cpus * 2
    )
    docs = docs.cache()
    docs.count()

    def t(name, fn):
        t0 = time.time()
        r = fn()
        print(f"{name:38s} {time.time()-t0:8.2f}s   {r}", flush=True)

    lsh = MinHashLSH(num_perm=128, bands=32, rows=4, shingle_size=3)
    bands = lsh.bands_table(docs, "doc_id", "text")
    t("bands_table.count", bands.count)
    t("bands_table.count (2nd)", bands.count)

    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.collect_list("id").alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= 2000))
    )
    t("buckets.count", buckets.count)
    t("buckets sum sz", lambda: buckets.agg(F.sum(F.size("_ids"))).collect()[0][0])

    t("full candidate_pairs.count", lambda: lsh.candidate_pairs(
        docs, "doc_id", "text").count())
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
