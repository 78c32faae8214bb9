"""Measure identities (reference tests/test_measures.py:20-107)."""

import pytest

from recordlinkage_spark import measures


@pytest.fixture()
def truth_pred(spark):
    truth = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0)], "id_1 long, id_2 long"
    )
    pred = spark.createDataFrame(
        [(2, 0), (3, 0), (5, 0), (6, 0), (7, 0)], "id_1 long, id_2 long"
    )
    return truth, pred


def test_confusion_counts(truth_pred):
    truth, pred = truth_pred
    tp = measures.true_positives(truth, pred)
    fp = measures.false_positives(truth, pred)
    fn = measures.false_negatives(truth, pred)
    assert (tp, fp, fn) == (2, 3, 2)
    total = 20
    tn = measures.true_negatives(truth, pred, total)
    assert tn == 20 - 7
    cm = measures.confusion_matrix(truth, pred, total)
    assert cm == [[2, 2], [3, 13]]


def test_scalar_measures(truth_pred):
    truth, pred = truth_pred
    tp, fp, fn, tn = 2, 3, 2, 13
    assert measures.precision(tp, fp) == pytest.approx(0.4)
    assert measures.recall(tp, fn) == pytest.approx(0.5)
    assert measures.fscore(tp, fp, fn) == pytest.approx(2 * 0.4 * 0.5 / 0.9)
    assert measures.accuracy(tp, tn, 20) == pytest.approx(0.75)
    assert measures.specificity(tn, fp) == pytest.approx(13 / 16)
    assert measures.pair_recall(truth, pred) == pytest.approx(0.5)


def test_full_index_and_reduction(spark):
    assert measures.full_index_size(10) == 45
    assert measures.full_index_size(10, 20) == 200
    pairs = spark.createDataFrame([(i, 0) for i in range(9)], "id_1 long, id_2 long")
    assert measures.reduction_ratio(pairs, 10) == pytest.approx(1 - 9 / 45)


def test_cluster_pair_recall(spark):
    truth = spark.createDataFrame([(2, 1), (3, 1), (5, 4)], "id_1 long, id_2 long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 99)], "id long, cluster_id long"
    )
    # (2,1) ok, (3,1) ok, (5,4) split -> recall 2/3
    assert measures.cluster_pair_recall(truth, clusters) == pytest.approx(2 / 3)


def test_counts_are_set_semantic(spark):
    """Duplicate pair rows in pred/truth must not inflate TP/FP/FN — the
    reference's MultiIndex algebra is set-semantic (session-8 review
    fix; raw join counts let recall exceed 1.0)."""
    t = spark.createDataFrame([(1, 2), (3, 4)], "id_1 int, id_2 int")
    p_dup = spark.createDataFrame(
        [(1, 2), (1, 2), (5, 6), (5, 6)], "id_1 int, id_2 int"
    )
    assert measures.true_positives(t, p_dup) == 1
    assert measures.false_positives(t, p_dup) == 1
    t_dup = t.union(t)
    assert measures.false_negatives(t_dup, p_dup) == 1
    tp = measures.true_positives(t_dup, p_dup)
    fn = measures.false_negatives(t_dup, p_dup)
    assert measures.recall(tp, fn) <= 1.0
