"""Micro-bench sub-steps of MinHashLSH.candidate_pairs."""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(cpus: int, n_docs: int) -> None:
    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.datagen import webtext_corpus_distributed
    from recordlinkage_spark.minhash import MinHashLSH, make_band_udf
    from recordlinkage_spark import textfns
    from pyspark.sql import functions as F

    spark = get_spark(f"micro-{cpus}", master=f"local[{cpus}]",
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
        print(f"{name:35s} {time.time()-t0:8.2f}s   {r}")

    t("count(cached)", lambda: docs.count())
    t("tokens only: sum(size)", lambda: docs.select(
        F.sum(F.size(textfns.tokens(F.col("text")))).alias("n")).collect()[0]["n"])

    sh = textfns.with_word_shingle_hashes(docs, "text", 3)
    t("shingle hashes: sum(size)", lambda: sh.select(
        F.sum(F.size("_sh")).alias("n")).collect()[0]["n"])

    udf = make_band_udf(128, 32, 4, 42)
    sig = sh.select(F.col("doc_id").alias("id"), udf(F.col("_sh")).alias("_bands"))
    t("minhash UDF: count nonnull", lambda: sig.filter(
        F.col("_bands").isNotNull()).count())

    lsh = MinHashLSH(num_perm=128, bands=32, rows=4, shingle_size=3)
    bands = lsh.bands_table(docs, "doc_id", "text")
    t("bands_table: count", lambda: bands.count())

    t("full candidate_pairs: count", lambda: lsh.candidate_pairs(
        docs, "doc_id", "text").count())
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
