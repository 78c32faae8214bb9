"""Structured Streaming dedup operators (file source → memory sink)."""

import time

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import streaming
from recordlinkage_spark.datagen import webtext_corpus


@pytest.fixture()
def stream_dir(spark, tmp_path):
    docs, _ = webtext_corpus(spark, n_docs=200, dup_fraction=0.4, seed=7)
    path = str(tmp_path / "in")
    docs.select("url", "warc_ts", "text", "lang").coalesce(2).write.parquet(path)
    return path, docs


def _run_stream(q_df, name):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_exact_dedup(spark, stream_dir):
    path, docs = stream_dir
    schema = docs.select("url", "warc_ts", "text", "lang").schema
    stream = spark.readStream.schema(schema).parquet(path)
    deduped = streaming.streaming_exact_dedup(stream, ts_col="warc_ts")
    _run_stream(deduped, "dedup_sink")
    out = spark.sql("select * from dedup_sink")
    n_out = out.count()
    n_distinct_fp = (
        streaming.with_fingerprint(docs).select("fingerprint").distinct().count()
    )
    # one row per distinct content fingerprint (exact copies suppressed)
    assert n_out == n_distinct_fp
    assert out.select("fingerprint").distinct().count() == n_out


def test_streaming_minhash_signatures(spark, stream_dir):
    path, docs = stream_dir
    schema = docs.select("url", "warc_ts", "text", "lang").schema
    stream = spark.readStream.schema(schema).parquet(path)
    sigs = streaming.streaming_minhash_signatures(
        stream, id_col="url", num_perm=32, bands=8, rows=4
    )
    _run_stream(sigs, "sig_sink")
    out = spark.sql("select * from sig_sink")
    assert out.columns == ["id", "band_id", "band_hash"]
    assert out.count() == docs.count() * 8  # 8 bands per doc


def test_foreach_batch_incremental_lsh(spark, stream_dir, tmp_path):
    path, docs = stream_dir
    schema = docs.select("url", "warc_ts", "text", "lang").schema
    stream = spark.readStream.schema(schema).parquet(path)
    sigs = streaming.streaming_minhash_signatures(
        stream, id_col="url", num_perm=32, bands=8, rows=4
    )
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    q = (
        sigs.writeStream.foreachBatch(
            streaming.foreach_batch_dedup(store, pairs_out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.read.parquet(pairs_out)
    assert pairs.count() > 0  # planted exact dups collide in every band
    assert pairs.filter(F.col("id_1") <= F.col("id_2")).count() == 0
