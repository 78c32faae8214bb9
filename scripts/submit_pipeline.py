"""spark-submit job entry for the dedup pipeline (north_rule: run via
``spark-submit --py-files`` on a multi-executor cluster).

Usage (see scripts/run_spark_submit.sh for the packaged invocation):

    spark-submit --py-files recordlinkage_spark.zip \
        scripts/submit_pipeline.py <input_parquet> <out_dir> \
        [--id-col url] [--text-col text] [--threshold 0.5]

Reads the records table, runs MinHash/LSH -> verify -> substring ->
connected components with parquet stage checkpoints under <out_dir>
(resume-from-manifest), and writes the cluster table + metrics."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--shingle-size", type=int, default=3)
    args = ap.parse_args()

    # spark-submit provides master/conf; only appName set here
    spark = SparkSession.builder.appName("recordlinkage-dedup").getOrCreate()

    from recordlinkage_spark.config import EngineConfig
    from recordlinkage_spark.pipeline import DedupPipeline

    records = spark.read.parquet(args.input)
    cfg = EngineConfig(
        num_perm=args.num_perm, lsh_bands=args.bands, lsh_rows=args.rows,
        shingle_size=args.shingle_size,
    )
    pipe = DedupPipeline(cfg, work_dir=args.out_dir, jaccard_threshold=args.threshold)
    out = pipe.run(records, id_col=args.id_col, text_col=args.text_col)
    n_clusters = out["clusters"].count()
    print(json.dumps({"stages": pipe.metrics, "cluster_rows": n_clusters}))
    spark.stop()


if __name__ == "__main__":
    main()
