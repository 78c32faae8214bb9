"""Structured Streaming operators for incremental dedup.

The reference is batch-only (SURVEY.md §2.8: no streaming anywhere), so
this module is additive: the operators a continuously-ingesting webtext
pipeline needs, expressed with the standard readStream → transform →
writeStream contract.

- ``streaming_exact_dedup``: drop exact duplicates by content fingerprint
  within a watermark window (state-bounded: Spark evicts fingerprints older
  than the watermark — at 10^12 docs/day unbounded dropDuplicates state
  would OOM; the watermark bounds it).
- ``streaming_minhash_signatures``: per-microbatch MinHash band signatures
  (stateless map — the LSH self-join then runs as a periodic batch job over
  the signature table, the standard lambda design for streaming near-dup).
- ``foreach_batch_dedup``: a forEachBatch hook that runs the batch LSH pass
  per micro-batch against the accumulated signature store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recordlinkage_spark import textfns
from recordlinkage_spark.minhash import make_text_band_udf


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", textfns.doc_fingerprint(F.col(text_col)))


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-dup suppression on a stream: keep the first arrival of each
    content fingerprint inside the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by fingerprint and evicts
    entries older than the watermark — bounded state, late data beyond the
    watermark is emitted rather than silently joined (document this to
    downstream consumers)."""
    return (
        with_fingerprint(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_minhash_signatures(
    stream: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Stateless signature extraction on a stream: (id, band_id, band_hash)
    rows ready to append to the signature table the periodic LSH join scans."""
    udf = make_text_band_udf(num_perm, bands, rows, shingle_size)
    sig = stream.select(
        F.col(id_col).alias("id"), udf(F.col(text_col)).alias("_bands")
    ).filter(F.col("_bands").isNotNull())
    return sig.select("id", F.posexplode("_bands").alias("band_id", "band_hash"))


def foreach_batch_dedup(signature_store_path: str, pairs_out_path: str,
                        max_bucket_size: int = 2000):
    """forEachBatch hook: append the micro-batch's signatures to the store,
    then join the NEW signatures against the full store to emit only pairs
    involving fresh docs (incremental LSH — no recomputation of old pairs)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(signature_store_path)
        store = spark.read.parquet(signature_store_path)
        key = ["band_id", "band_hash"]
        sizes = store.groupBy(*key).agg(F.count("*").alias("_n"))
        store = store.join(
            sizes.filter(F.col("_n") <= max_bucket_size).select(*key), key
        )
        fresh = batch_df.withColumnRenamed("id", "id_1")
        pairs = (
            fresh.join(store.withColumnRenamed("id", "id_2"), key)
            .filter(F.col("id_1") != F.col("id_2"))
            .select(
                F.greatest("id_1", "id_2").alias("id_1"),
                F.least("id_1", "id_2").alias("id_2"),
            )
            .dropDuplicates(["id_1", "id_2"])
        )
        pairs.write.mode("append").parquet(pairs_out_path)

    return process
