"""Generators: determinism + planted-duplicate structure (FIXTURES.md F1/F4)."""

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.datagen import (
    binary_vectors,
    webtext_corpus,
    webtext_corpus_distributed,
)


def test_webtext_corpus_deterministic(spark):
    d1, t1 = webtext_corpus(spark, n_docs=300, seed=9)
    d2, t2 = webtext_corpus(spark, n_docs=300, seed=9)
    assert d1.count() == d2.count() == 300
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))
    # urls unique
    assert d1.select("url").distinct().count() == 300


def test_webtext_corpus_distributed_deterministic(spark):
    d1, t1 = webtext_corpus_distributed(spark, 500, seed=3, partitions=4)
    d2, t2 = webtext_corpus_distributed(spark, 500, seed=3, partitions=8)
    # partitioning must not change content
    assert sorted(map(tuple, d1.select("url", "text").collect())) == sorted(
        map(tuple, d2.select("url", "text").collect())
    )
    assert d1.count() == 500
    kinds = {r["kind"] for r in t1.select("kind").distinct().collect()}
    assert kinds <= {"exact", "near", "span", "span_weak"}
    # exact dups really are byte-identical to their original
    ex = t1.filter("kind = 'exact'").limit(5)
    txt = d1.select(F.col("url").alias("url_1"), F.col("text").alias("t1"))
    txt2 = d1.select(F.col("url").alias("url_2"), F.col("text").alias("t2"))
    j = ex.join(txt, "url_1").join(txt2, "url_2")
    for r in j.collect():
        assert r["t1"] == r["t2"]


def test_webtext_truth_canonical_order(spark):
    _, truth = webtext_corpus_distributed(spark, 400, seed=5)
    assert truth.filter(F.col("url_1") <= F.col("url_2")).count() == 0


def test_binary_vectors_stats(spark):
    feats, truth = binary_vectors(spark, n=5000, n_match=1000, random_state=535)
    assert feats.count() == 5000 and truth.count() == 1000
    # matched rows agree on c_1 with prob ~m[0]=0.92
    m1 = (
        feats.join(truth, ["id_1", "id_2"])
        .agg(F.avg("c_1").alias("m"))
        .collect()[0]["m"]
    )
    assert m1 == pytest.approx(0.92, abs=0.03)
    u1 = (
        feats.join(truth, ["id_1", "id_2"], "left_anti")
        .agg(F.avg("c_1").alias("u"))
        .collect()[0]["u"]
    )
    assert u1 == pytest.approx(0.19, abs=0.03)


def test_span_truth_pairs_guarantee_shared_run(spark):
    """Every truth pair labeled 'span' must actually share a >=50-token
    contiguous run; non-guaranteed dup-dup pairs are 'span_weak'
    (session-8 review fix — two span dups may keep disjoint windows)."""
    docs, truth = webtext_corpus(spark, n_docs=300, dup_fraction=0.4, seed=7)
    texts = {r["url"]: r["text"].split() for r in docs.collect()}

    def has_run(a, b, k=50):
        if len(a) < k or len(b) < k:
            return False
        grams = {tuple(a[i:i + k]) for i in range(len(a) - k + 1)}
        return any(tuple(b[i:i + k]) in grams for i in range(len(b) - k + 1))

    span_pairs = [
        (r["url_1"], r["url_2"])
        for r in truth.filter("kind = 'span'").collect()
    ]
    assert span_pairs
    for u1, u2 in span_pairs:
        assert has_run(texts[u1], texts[u2]), (u1, u2)
