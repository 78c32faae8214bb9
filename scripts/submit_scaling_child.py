"""spark-submit child for the packaged-deployment scaling measurement.

Runs the full MinHash/LSH dedup pipeline over a pre-generated webtext
corpus parquet and prints ONE JSON line (secs, docs/sec, recall, stage
breakdown, executor count). Submitted by scripts/submit_scaling.py via

    spark-submit --master local-cluster[N,4,8192] \
        --py-files recordlinkage_spark.zip submit_scaling_child.py <dir>

so the engine import comes from the SHIPPED ZIP (the parent runs this
from a scratch cwd that does not contain the repo), executors are real
separate JVMs with their own Python workers, and N executors vs 4N
executors is measured with the exact artifact a real cluster would
receive (north_rule: "run via spark-submit --py-files ... at two
cluster sizes").

Master/conf come from spark-submit; only the appName is set here —
same contract as scripts/submit_pipeline.py.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    corpus_dir = sys.argv[1]
    spark = SparkSession.builder.appName("submit-scaling-child").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip (asserted: report the origin)
    import recordlinkage_spark
    from recordlinkage_spark import measures
    from recordlinkage_spark.config import EngineConfig
    from recordlinkage_spark.pipeline import DedupPipeline

    # full input-shape table (url, warc_ts, html, lang, text, doc_id...);
    # select only what the job needs — parquet column pruning drops the
    # heavy html payload at the scan
    docs = (
        spark.read.parquet(f"{corpus_dir}/docs.parquet")
        .select("doc_id", "url", "text")
        .cache()
    )
    n_docs = docs.count()
    truth = spark.read.parquet(f"{corpus_dir}/truth.parquet").cache()
    truth.count()

    # warm every executor's Python workers (fork + numpy/pandas import)
    # before the measured window — steady-state throughput, not start-up
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda s: s.str.len().astype("int64"), LongType())
    for _ in range(2):
        docs.select(warm(F.col("text")).alias("n")).agg(F.sum("n")).collect()

    cfg = EngineConfig(num_perm=128, lsh_bands=32, lsh_rows=4, shingle_size=3)
    t0 = time.time()
    pipe = DedupPipeline(cfg, jaccard_threshold=0.5)
    out = pipe.run(docs, id_col="doc_id", text_col="text")
    out["clusters"].count()
    secs = time.time() - t0

    t = truth.filter(F.col("kind").isin(["exact", "near"])).select(
        F.col("url_1").alias("id_1"), F.col("url_2").alias("id_2")
    )
    id_map = docs.select("doc_id", "url")
    clusters = out["clusters"].join(id_map, "doc_id").select(
        F.col("url").alias("id"), "cluster_id"
    )
    rec = measures.cluster_pair_recall(t, clusters, id_col="id")

    # driver + one entry per live executor; local-cluster[N,...] => N+1
    n_exec = (
        spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    )
    print(json.dumps({
        "master": spark.sparkContext.master,
        "executors": n_exec,
        "module_origin": recordlinkage_spark.__file__,
        "n_docs": n_docs,
        "secs": round(secs, 2),
        "docs_per_sec": round(n_docs / secs, 1),
        "dup_pair_recall": round(rec, 5),
        "stages": {m["stage"]: m["secs"] for m in pipe.metrics if "secs" in m},
        "dropped_buckets": sum(
            m.get("dropped_buckets", 0) for m in pipe.metrics
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
