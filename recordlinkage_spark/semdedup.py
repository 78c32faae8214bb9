"""SemDeDup-style semantic deduplication over an embedding column.

Clusters embeddings with a trained spherical-k-means coarse quantizer
(ann.ivf_train), computes exact pairwise cosine WITHIN each cluster, and
keeps one representative (min id) per connected component of the
over-threshold similarity graph — the published SemDeDup recipe (Abbas
et al. 2023, arXiv:2303.09540) expressed Spark-first.

No reference counterpart: recordlinkage has no embedding operators; this
is one of the LLM-training-data operators the survey scopes in alongside
the MinHash/SimHash/winnowing passes (SURVEY.md §2 LLM-pipeline table).

Plan shape (what matters at 100 TB):

1. train — driver numpy spherical k-means on a seeded bounded sample
   (``ann.ivf_train``; same bounded-statistics shape as the classifier
   fits, deterministic by construction).
2. assign — ONE broadcast-matmul ``mapInPandas`` pass tags every vector
   with its nearest-centroid ``list_id`` and carries the vector along
   (``ann.ivf_assign(keep_vec=True)``) — the corpus is scanned once and
   never re-joined.
3. edges — ONE shuffle on ``list_id``; per-partition streaming cluster
   expansion (clusters sorted within partitions, Arrow batches, carry
   across batch boundaries) runs a blockwise ``X @ X.T`` cosine inside
   each cluster and emits only ``>= threshold`` edges. A cluster that
   exceeds ``cluster_cap`` rows is dropped at the cap (its rows stay
   un-deduped, i.e. kept) and counted on ``dropped_acc`` — bounded
   memory under mega-cluster skew, the same cap contract as
   ``minhash.bucket_pairs``.
4. components — min-label connected components over the edge graph
   (``network.ConnectedComponents``, component = min id); ``keep`` is
   ``id == component``; singletons keep themselves.

Versus LSH near-dup (``ann.embedding_near_dup_pairs``): the candidate
scope here is a trained PARTITION of the space — every vector lands in
exactly one cluster, so pair expansion is a disjoint partition-local
matmul with no cross-table ``dropDuplicates`` shuffle, and the verify
join disappears entirely because the assign pass carries the vectors.
The tradeoff is boundary recall: near-dups straddling a centroid border
are missed (recall-gated in tests/test_semdedup.py). Multi-assignment
(nprobe-style) is deliberately not done — SemDeDup's published
configuration is one cluster per point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import ivf_assign, ivf_train
from .network import ConnectedComponents

__all__ = ["cluster_cosine_edges", "semantic_dedup"]


def _make_cluster_edge_expander(threshold: float, cap: int, block: int,
                                dropped_acc=None):
    """mapInPandas function over (id, list_id, _cv) rows hash-partitioned
    on ``list_id`` and sorted by (list_id, id): emits exact-cosine edges
    ``(id_1, id_2, cosine)`` for in-cluster pairs at ``>= threshold``.

    Streams Arrow batches with a carry-over for the cluster spanning a
    batch boundary; a cluster that grows past ``cap`` rows is dropped
    immediately and poisoned so its remaining rows in later batches are
    skipped (bounded memory under mega-cluster skew; same contract as
    minhash._make_bucket_pair_expander). The in-cluster matmul runs in
    ``block``-row stripes so peak scratch is block*|cluster| doubles,
    not |cluster|^2.

    Ids are ascending inside each cluster (the sort), so emitted pairs
    are canonical (id_1 < id_2) and the output is deterministic.
    """

    def edges_of(pdf: pd.DataFrame):
        """Complete cluster (2 <= rows <= cap) -> list of edge frames."""
        ids = pdf["id"].to_numpy()
        X = np.array(pdf["_cv"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        Xn = X / norms
        m = len(ids)
        out = []
        for i0 in range(0, m, block):
            S = Xn[i0:i0 + block] @ Xn.T  # (<=block, m)
            bi, bj = np.nonzero(S >= threshold)
            gi = bi + i0
            keep = gi < bj  # upper triangle only: canonical + no self
            if keep.any():
                out.append(pd.DataFrame({
                    "id_1": ids[gi[keep]],
                    "id_2": ids[bj[keep]],
                    "cosine": S[bi[keep], bj[keep]],
                }))
        return out

    def expand(batches):
        carry: pd.DataFrame | None = None
        drop_list = None  # poisoned oversize cluster's list_id

        def finish(pdf: pd.DataFrame):
            """Emit edges for one complete cluster, applying the cap."""
            if len(pdf) > cap:
                if dropped_acc is not None:
                    dropped_acc.add(1)
                return []
            if len(pdf) < 2:
                return []
            return edges_of(pdf)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            lists = pdf["list_id"].to_numpy()
            if drop_list is not None:
                hit = lists == drop_list
                if hit.any():
                    pdf = pdf[~hit].reset_index(drop=True)
                    lists = lists[~hit]
                else:
                    drop_list = None
            if len(pdf) == 0:
                continue
            # boundaries of complete clusters; the last cluster may
            # continue into the next batch, so hold it as carry
            change = np.nonzero(lists[1:] != lists[:-1])[0] + 1
            last_start = int(change[-1]) if len(change) else 0
            carry = pdf.iloc[last_start:]
            if len(carry) > cap:  # oversize: poison + drop now
                drop_list = lists[last_start]
                carry = None
                if dropped_acc is not None:
                    dropped_acc.add(1)
            head = pdf.iloc[:last_start]
            starts = np.concatenate(([0], change[:-1])) if len(change) else []
            for s, e in zip(starts, change):
                for frame in finish(head.iloc[s:e]):
                    yield frame
        if carry is not None:
            for frame in finish(carry):
                yield frame

    return expand


def cluster_cosine_edges(
    assigned: DataFrame,
    threshold: float,
    cluster_cap: int = 8192,
    block: int = 1024,
    dropped_acc=None,
) -> DataFrame:
    """``assigned(id, list_id, _cv array<double>)`` -> exact-cosine edges
    ``(id_1, id_2, cosine)`` at ``>= threshold`` within each cluster via
    ONE shuffle: repartition on ``list_id``, per-partition sort, streaming
    blockwise-matmul expansion (see _make_cluster_edge_expander).

    Clusters are disjoint (one list per vector), so no cross-key
    ``dropDuplicates`` pass is needed — unlike the multi-table LSH path.
    """
    id_type = dict(assigned.dtypes)["id"]
    # keyed repartition without an explicit count so AQE can coalesce the
    # reduce side (see minhash.bucket_pairs — same contract: coalescing
    # merges whole hash partitions and the sort runs after the merge, so
    # clusters stay contiguous within one task)
    grouped = (
        assigned.repartition("list_id")
        .sortWithinPartitions("list_id", "id")
    )
    expand = _make_cluster_edge_expander(threshold, cluster_cap, block,
                                         dropped_acc)
    return grouped.mapInPandas(
        expand, schema=f"id_1 {id_type}, id_2 {id_type}, cosine double"
    )


def semantic_dedup(
    corpus: DataFrame,
    n_lists: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
    sample_rows: int = 100_000,
    train_iters: int = 10,
    cluster_cap: int = 8192,
    block: int = 1024,
    dropped_acc=None,
    cc: ConnectedComponents | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """SemDeDup: ``(id, component, keep)`` for every non-null embedding.

    ``component`` is the min id of the vector's connected component in
    the within-cluster cosine >= ``threshold`` graph (its own id for
    singletons); ``keep`` is true exactly for the representative, so
    ``filter(keep)`` is the deduplicated corpus and ``filter(~keep)``
    the removed semantic duplicates.

    ``order_cols`` (e.g. ``[F.desc("quality")]``; columns must exist on
    ``corpus``) switches the representative from min-id to an explicit
    keep policy via ``network.select_representatives`` — the same
    survivorship contract as ``DedupPipeline.run(quality_col=...)``.

    Pass ``centroids`` to reuse a trained quantizer across snapshots
    (incremental dedup of a growing corpus keeps assignments stable);
    otherwise a seeded deterministic k-means is trained on a bounded
    sample. Null embeddings are excluded (they have no geometry); union
    them back with keep=true if the pipeline must retain them.
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    if centroids is None:
        centroids = ivf_train(
            corpus, n_lists, id_col, vec_col,
            sample_rows=sample_rows, iters=train_iters, seed=seed,
        )
    assigned = ivf_assign(
        corpus, centroids, id_col, vec_col, out_id="id", keep_vec=True
    )
    edges = cluster_cosine_edges(
        assigned, threshold, cluster_cap=cluster_cap, block=block,
        dropped_acc=dropped_acc,
    )
    comp = (cc or ConnectedComponents()).compute(
        edges.select("id_1", "id_2")
    )
    if order_cols:
        from recordlinkage_spark.network import select_representatives

        attrs = corpus.drop(vec_col).withColumnRenamed(id_col, "id")
        reps = select_representatives(
            comp, attrs, id_col="id", order_cols=list(order_cols)
        )
        return reps.select(
            "id",
            F.col("cluster_id").alias("component"),
            F.col("is_representative").alias("keep"),
        )
    ids = corpus.select(F.col(id_col).alias("id"))
    return (
        ids.join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("cluster_id", "id").alias("component"),
        )
        .withColumn("keep", F.col("id") == F.col("component"))
    )
