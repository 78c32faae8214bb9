"""SemDeDup semantic dedup (recordlinkage_spark/semdedup.py).

Gates:
- single-cluster edges == exact numpy all-pairs cosine (values to 1e-9)
- keep-one-per-group semantics + deterministic min-id representative
- boundary recall floor for planted near-identical dups at multi-cluster
- mega-cluster cap: drops fire the accumulator, carriers stay kept,
  clean dups elsewhere still collapse (carry/poison paths exercised via
  a tiny Arrow batch size)
- end-to-end determinism (golden-pin precondition)
"""

import numpy as np
import pytest

from recordlinkage_spark.ann import ivf_train
from recordlinkage_spark.semdedup import cluster_cosine_edges, semantic_dedup


def _emb_df(spark, X):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _exact_edges(X, threshold):
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    S = Xn @ Xn.T
    out = {}
    n = len(X)
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                out[(i, j)] = S[i, j]
    return out


def _blobs_with_dups(rng, n_blobs=4, per_blob=30, n_dup_groups=10, dim=16,
                     noise=1e-4):
    """Well-separated gaussian blobs + planted near-identical dup groups
    (3 copies each, tiny noise). Returns (X, dup_pairs set of id pairs)."""
    centers = rng.normal(size=(n_blobs, dim)) * 10.0
    rows, dup_pairs = [], set()
    for b in range(n_blobs):
        for _ in range(per_blob):
            rows.append(centers[b] + rng.normal(size=dim))
    for g in range(n_dup_groups):
        base = centers[g % n_blobs] + rng.normal(size=dim)
        ids = []
        for _ in range(3):
            ids.append(len(rows))
            rows.append(base + rng.normal(size=dim) * noise)
        for a in range(3):
            for c in range(a + 1, 3):
                dup_pairs.add((ids[a], ids[c]))
    return np.array(rows), dup_pairs


def test_single_cluster_edges_match_exact_cosine(spark):
    rng = np.random.RandomState(7)
    X, _ = _blobs_with_dups(rng, n_blobs=2, per_blob=20, n_dup_groups=5)
    df = _emb_df(spark, X)
    # one centroid => every vector in list 0 => edges are ALL pairs
    centroids = np.ones((1, X.shape[1])) / np.sqrt(X.shape[1])
    from recordlinkage_spark.ann import ivf_assign

    assigned = ivf_assign(df, centroids, "vec_id", "embedding",
                          out_id="id", keep_vec=True)
    got = {
        (r.id_1, r.id_2): r.cosine
        for r in cluster_cosine_edges(assigned, 0.9, block=7).collect()
    }
    want = _exact_edges(X, 0.9)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    assert all(a < b for a, b in got)  # canonical orientation


def test_keep_one_per_duplicate_group(spark):
    rng = np.random.RandomState(11)
    X, dup_pairs = _blobs_with_dups(rng, n_blobs=3, per_blob=10,
                                    n_dup_groups=6)
    df = _emb_df(spark, X)
    out = semantic_dedup(df, n_lists=1, threshold=0.999999,
                         sample_rows=1000).toPandas()
    assert len(out) == len(X)
    # every component keeps exactly one representative, the min id
    for comp, grp in out.groupby("component"):
        assert grp["keep"].sum() == 1
        assert grp.loc[grp["keep"], "id"].iloc[0] == grp["id"].min() == comp
    # each planted triple collapsed into one component
    by_id = out.set_index("id")["component"]
    for a, b in dup_pairs:
        assert by_id[a] == by_id[b]
    # non-dup blob members (cosine << 0.999999 apart) stay singletons
    n_dup_rows = len({i for p in dup_pairs for i in p})
    assert (out["keep"]).sum() == len(X) - n_dup_rows + n_dup_rows // 3


def test_keep_policy_order_cols(spark):
    """order_cols switches the representative from min-id to an explicit
    keep policy (same survivorship contract as the pipeline's
    quality_col path): highest quality wins within every component,
    min-id only as the tiebreak; singletons unaffected."""
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    X, dup_pairs = _blobs_with_dups(rng, n_blobs=3, per_blob=10,
                                    n_dup_groups=6)
    # quality = id (descending ids win) -> representative is the MAX id
    df = _emb_df(spark, X).withColumn(
        "quality", F.col("vec_id").cast("double")
    )
    out = semantic_dedup(df, n_lists=1, threshold=0.999999,
                         sample_rows=1000,
                         order_cols=[F.desc("quality")]).toPandas()
    assert len(out) == len(X)
    for comp, grp in out.groupby("component"):
        assert grp["keep"].sum() == 1
        assert grp.loc[grp["keep"], "id"].iloc[0] == grp["id"].max()
        assert comp == grp["id"].min()  # component label stays min-id


def test_multi_cluster_recall_floor(spark):
    """Planted near-identical dups must survive the coarse quantizer:
    copies at noise 1e-4 share a nearest centroid essentially always."""
    rng = np.random.RandomState(13)
    X, dup_pairs = _blobs_with_dups(rng, n_blobs=4, per_blob=40,
                                    n_dup_groups=15)
    df = _emb_df(spark, X)
    out = semantic_dedup(df, n_lists=6, threshold=0.999999,
                         sample_rows=1000, seed=3).toPandas()
    by_id = out.set_index("id")["component"]
    found = sum(1 for a, b in dup_pairs if by_id[a] == by_id[b])
    assert found / len(dup_pairs) >= 0.95


def test_mega_cluster_cap_drops_and_counts(spark):
    """A cluster bigger than cluster_cap is dropped (its rows stay kept)
    while clean dup groups elsewhere still collapse. Tiny Arrow batches
    force the carry + poison paths in the streaming expander."""
    rng = np.random.RandomState(17)
    dim = 16
    boiler = rng.normal(size=dim)
    rows = [boiler + rng.normal(size=dim) * 1e-5 for _ in range(120)]
    mega_ids = set(range(len(rows)))
    clean_base = -boiler + rng.normal(size=dim)
    clean_ids = []
    for _ in range(3):
        clean_ids.append(len(rows))
        rows.append(clean_base + rng.normal(size=dim) * 1e-5)
    X = np.array(rows)
    df = _emb_df(spark, X)
    acc = spark.sparkContext.accumulator(0)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        out = semantic_dedup(
            df, n_lists=2, threshold=0.999, sample_rows=1000,
            cluster_cap=50, dropped_acc=acc,
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert acc.value >= 1  # the mega cluster was dropped, observably
    by_id = out.set_index("id")
    # dropped rows are NOT deduped: all kept, each its own component
    assert by_id.loc[sorted(mega_ids), "keep"].all()
    # the clean triple still collapsed to one representative
    comps = {by_id.loc[i, "component"] for i in clean_ids}
    assert len(comps) == 1
    assert by_id.loc[clean_ids, "keep"].sum() == 1


def test_semantic_dedup_deterministic(spark):
    rng = np.random.RandomState(23)
    X, _ = _blobs_with_dups(rng, n_blobs=4, per_blob=25, n_dup_groups=8)
    df = _emb_df(spark, X)

    def run():
        pdf = semantic_dedup(df, n_lists=5, threshold=0.9999,
                             sample_rows=1000, seed=9).toPandas()
        return sorted(map(tuple, pdf.to_numpy().tolist()))

    assert run() == run()


def test_reused_centroids_skip_training(spark):
    """Passing trained centroids pins assignment across snapshots — the
    incremental-dedup contract (same centroids => same clusters for
    unchanged rows, no retrain drift)."""
    rng = np.random.RandomState(29)
    X, _ = _blobs_with_dups(rng, n_blobs=3, per_blob=20, n_dup_groups=5)
    df = _emb_df(spark, X)
    C = ivf_train(df, 4, "vec_id", "embedding", sample_rows=1000, seed=5)
    a = semantic_dedup(df, threshold=0.9999, centroids=C).toPandas()
    b = semantic_dedup(df, threshold=0.9999, centroids=C).toPandas()
    key = lambda p: sorted(map(tuple, p.to_numpy().tolist()))
    assert key(a) == key(b)
