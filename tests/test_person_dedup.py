"""FEBRL-analog person fixture + deterministic end-to-end record linkage
(the examples/dedup_deterministic.py shape: Block -> Compare ->
manual-coefficient logistic -> matches -> measures)."""

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import measures
from recordlinkage_spark.classifiers import LogisticRegressionClassifier
from recordlinkage_spark.comparing import Compare
from recordlinkage_spark.datagen import person_corpus, person_truth_links
from recordlinkage_spark.indexing import Block, Index, SortedNeighbourhood


@pytest.fixture(scope="module")
def people(spark):
    df = person_corpus(spark, n_originals=300, max_dups_per_rec=2, seed=42).cache()
    truth = person_truth_links(df).cache()
    df.count(), truth.count()
    return df, truth


def test_generator_deterministic(spark):
    a = person_corpus(spark, n_originals=50, seed=7).collect()
    b = person_corpus(spark, n_originals=50, seed=7).collect()
    assert a == b


def test_truth_links_shape(people):
    df, truth = people
    # every pair shares a rec number; dup counts per original are 0-2 so
    # each cluster of size m contributes m*(m-1)/2 pairs
    from collections import Counter

    sizes = Counter(
        r["rec_id"].split("-")[1] for r in df.select("rec_id").collect()
    )
    expect = sum(m * (m - 1) // 2 for m in sizes.values())
    assert truth.count() == expect


def test_deterministic_dedup_end_to_end(people):
    """Multi-pass index (Block on postcode UNION SNI on surname) ->
    JW/exact features -> manual logistic -> dup-pair recall >= 0.9 with
    precision >= 0.9 (1-3 corruptions leave most fields intact)."""
    df, truth = people
    idx = Index().add(Block("postcode")).add(
        SortedNeighbourhood("surname", window=5)
    )
    pairs = idx.index(df, id_col="rec_id")
    feats = (
        Compare()
        .string("given_name", "given_name", "jarowinkler", threshold=0.85, label="f_gn")
        .string("surname", "surname", "jarowinkler", threshold=0.85, label="f_sn")
        .exact("date_of_birth", "date_of_birth", label="f_dob")
        .exact("suburb", "suburb", label="f_sub")
        .exact("soc_sec_id", "soc_sec_id", label="f_ssn")
        .compute(pairs, df, id_col="rec_id")
    )
    clf = LogisticRegressionClassifier(
        coefficients=[2.0, 2.0, 2.0, 1.0, 4.0], intercept=-6.0
    )
    matches = clf.fit_predict(feats).filter("label = 1").select("id_1", "id_2")
    tp = measures.true_positives(truth, matches)
    fp = measures.false_positives(truth, matches)
    fn = measures.false_negatives(truth, matches)
    assert measures.recall(tp, fn) >= 0.9
    assert measures.precision(tp, fp) >= 0.9
