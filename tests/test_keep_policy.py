"""Quality-aware survivor selection through the pipeline's quality_col path
(network.select_representatives under an explicit quality-desc keep policy)
and the cluster-size histogram (measures.cluster_size_stats).

Not in the reference — its OneToOneLinking (reference
recordlinkage/network.py) resolves pair conflicts; cluster survivorship
(which duplicate a training-data pipeline KEEPS) is a webtext operator.
Driver-contract mirrors: dedup_keep_best / cluster_size_stats (both
DuckDB-oracle-backed at sf0.01)."""

from pyspark.sql import functions as F

from recordlinkage_spark.measures import cluster_size_stats
from recordlinkage_spark.network import select_representatives
from recordlinkage_spark.pipeline import DedupPipeline


def _clusters(spark):
    # two clusters: {a,b,c} -> a, {d,e} -> d ; f is a singleton (absent)
    return spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")],
        "id string, cluster_id string",
    )


def _records(spark, quality):
    return spark.createDataFrame(
        [(i, q) for i, q in quality.items()], "id string, q double"
    )


def keep_map(df):
    return {r["id"]: (r["cluster_id"], r["is_representative"]) for r in df.collect()}


def test_keep_highest_quality_per_cluster(spark):
    recs = _records(
        spark, {"a": 0.1, "b": 0.9, "c": 0.5, "d": 0.3, "e": 0.7, "f": 0.2}
    )
    got = keep_map(
        select_representatives(
            _clusters(spark), recs, id_col="id", order_cols=[F.desc("q")]
        )
    )
    assert got == {
        "a": ("a", False),
        "b": ("a", True),   # best quality in {a,b,c}
        "c": ("a", False),
        "d": ("d", False),
        "e": ("d", True),   # best quality in {d,e}
        "f": ("f", True),   # singleton: own representative
    }


def test_quality_tie_breaks_to_min_id(spark):
    recs = _records(spark, {"a": 0.5, "b": 0.5, "c": 0.5, "d": 0.5, "e": 0.5})
    got = keep_map(
        select_representatives(
            _clusters(spark), recs, id_col="id", order_cols=[F.desc("q")]
        )
    )
    assert sorted(i for i, (_, k) in got.items() if k) == ["a", "d"]


def test_no_order_defaults_to_min_id(spark):
    recs = _records(spark, {"a": 0.0, "b": 9.0, "c": 9.0, "d": 0.0, "e": 9.0})
    got = keep_map(select_representatives(_clusters(spark), recs, id_col="id"))
    assert got["a"][1] and got["d"][1]
    assert not (got["b"][1] or got["c"][1] or got["e"][1])


def test_cluster_size_stats_histogram(spark):
    stats = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_stats(_clusters(spark)).collect()
    }
    assert stats == {3: (1, 3), 2: (1, 2)}


def test_pipeline_keep_stage(spark, tmp_path):
    # 2 exact-dup docs + 2 distinct docs; quality picks u2 over u1
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            ("u1", base),
            ("u2", base),
            ("u3", "completely different text about gardening and soil"),
            ("u4", "yet another unrelated document mentioning spacecraft"),
        ],
        "url string, text string",
    ).withColumn("q", F.when(F.col("url") == "u2", 1.0).otherwise(0.5))
    out = DedupPipeline(jaccard_threshold=0.5).run(
        docs, id_col="url", text_col="text", quality_col="q"
    )
    assert "keep" in out
    assert out["keep"].columns == ["url", "cluster_id", "keep"]
    got = {r["url"]: r["keep"] for r in out["keep"].collect()}
    assert got == {"u1": False, "u2": True, "u3": True, "u4": True}


def test_pipeline_keep_stage_resumes(spark, tmp_path):
    """The keep stage participates in checkpoint/resume like every other
    stage: it lands in the manifest, and a second run with the same
    work_dir skips it (no new metrics entries) with identical output."""
    import json

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [("u1", base, 0.5), ("u2", base, 1.0), ("u3", "different text", 0.5)],
        "url string, text string, q double",
    )
    work = str(tmp_path / "wd")
    p1 = DedupPipeline(work_dir=work, jaccard_threshold=0.5)
    out1 = p1.run(docs, id_col="url", text_col="text", quality_col="q")
    keep1 = sorted(map(tuple, out1["keep"].collect()))

    mf = json.loads((tmp_path / "wd" / "manifest.json").read_text())
    assert "keep" in mf

    p2 = DedupPipeline(work_dir=work, jaccard_threshold=0.5)
    out2 = p2.run(docs, id_col="url", text_col="text", quality_col="q")
    assert p2.metrics == []  # everything resumed, keep included
    assert sorted(map(tuple, out2["keep"].collect())) == keep1
