"""Evaluation measures over pair DataFrames.

Reference: recordlinkage/measures.py — MultiIndex set algebra. In Spark the
set ops become joins/anti-joins on (id_1, id_2); the scalar measures are
driver-side arithmetic on the resulting counts (tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR = ["id_1", "id_2"]


def full_index_size(n_a: int, n_b: int | None = None) -> int:
    """n(n-1)/2 dedup; n*m link (measures.py:79-120)."""
    if n_b is None:
        return n_a * (n_a - 1) // 2
    return n_a * n_b


def reduction_ratio(pairs: DataFrame, n_a: int, n_b: int | None = None) -> float:
    """1 - |pairs| / n_max (measures.py:29-59)."""
    return 1.0 - pairs.count() / full_index_size(n_a, n_b)


# The reference's MultiIndex algebra is SET-semantic; the projections are
# deduped before counting so a pred/truth frame carrying duplicate pair
# rows (e.g. a union of two passes without dropDuplicates) cannot inflate
# the counts — raw join counts let recall exceed 1.0 and drove
# confusion_matrix's derived TN negative (session-8 review fix).
# true_negatives below was already set-semantic via distinct().

def true_positives(truth: DataFrame, pred: DataFrame) -> int:
    """|truth ∩ pred| (measures.py:123-145) — inner join count."""
    return truth.select(PAIR).distinct().join(
        pred.select(PAIR).distinct(), PAIR, "inner"
    ).count()


def false_positives(truth: DataFrame, pred: DataFrame) -> int:
    """|pred − truth| (measures.py:180-204) — left-anti join count."""
    return pred.select(PAIR).distinct().join(
        truth.select(PAIR), PAIR, "left_anti"
    ).count()


def false_negatives(truth: DataFrame, pred: DataFrame) -> int:
    """|truth − pred| (measures.py:207-231)."""
    return truth.select(PAIR).distinct().join(
        pred.select(PAIR), PAIR, "left_anti"
    ).count()


def true_negatives(truth: DataFrame, pred: DataFrame, total: int) -> int:
    """total − |truth ∪ pred| (measures.py:148-177)."""
    union = truth.select(PAIR).union(pred.select(PAIR)).distinct().count()
    return total - union


def confusion_matrix(truth: DataFrame, pred: DataFrame, total: int | None = None):
    """[[TP, FN], [FP, TN]] (measures.py:234-290)."""
    tp = true_positives(truth, pred)
    fn = false_negatives(truth, pred)
    fp = false_positives(truth, pred)
    tn = (total - tp - fn - fp) if total is not None else None
    return [[tp, fn], [fp, tn]]


def precision(tp: int, fp: int) -> float:
    return tp / (tp + fp) if (tp + fp) else 0.0


def recall(tp: int, fn: int) -> float:
    return tp / (tp + fn) if (tp + fn) else 0.0


def accuracy(tp: int, tn: int, total: int) -> float:
    return (tp + tn) / total


def specificity(tn: int, fp: int) -> float:
    return tn / (tn + fp) if (tn + fp) else 0.0


def fscore(tp: int, fp: int, fn: int) -> float:
    """Harmonic mean of precision and recall (measures.py:437-466)."""
    p, r = precision(tp, fp), recall(tp, fn)
    return 2 * p * r / (p + r) if (p + r) else 0.0


def pair_recall(truth: DataFrame, pred: DataFrame) -> float:
    """Dup-pair recall — THE acceptance metric (BASELINE.json: >= 0.99)."""
    tp = true_positives(truth, pred)
    fn = false_negatives(truth, pred)
    return recall(tp, fn)


def cluster_size_stats(
    clusters: DataFrame, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Duplicate-cluster size histogram: ``(cluster_size, n_clusters,
    n_docs)`` — the first thing to inspect after a dedup run (a fat tail
    means boilerplate collapsed into mega-clusters; compare against the
    dropped-bucket accumulators). Two hash aggregates with map-side
    partial combine; no joins, no windows — safe at any corpus size."""
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


def cluster_pair_recall(truth: DataFrame, clusters: DataFrame, id_col="id") -> float:
    """Recall of truth pairs implied by a cluster assignment: a truth pair
    (a,b) is recovered iff cluster(a) == cluster(b)."""
    c1 = clusters.withColumnRenamed(id_col, "id_1").withColumnRenamed(
        "cluster_id", "c_1"
    )
    c2 = clusters.withColumnRenamed(id_col, "id_2").withColumnRenamed(
        "cluster_id", "c_2"
    )
    joined = truth.select(PAIR).join(c1, "id_1", "left").join(c2, "id_2", "left")
    agg = joined.selectExpr(
        "sum(case when c_1 is not null and c_1 = c_2 then 1 else 0 end) as tp",
        "count(*) as total",
    ).collect()[0]
    return (agg["tp"] or 0) / agg["total"] if agg["total"] else 1.0
