"""ANN operators: brute-force cosine top-k baseline vs LSH-bucketed path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import ann


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # planted near-dups: ids 100+i close to i for first 5
    for i in range(5):
        v = base[i] + rng.normal(scale=0.01, size=16)
        rows.append((100 + i, (v / np.linalg.norm(v)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(vectors):
    out = ann.cosine_topk(vectors, vectors.filter("vec_id < 5"), k=3)
    rows = {(r["query_id"], r["rank"]): r for r in out.collect()}
    for q in range(5):
        # nearest neighbor of i is its planted near-dup 100+i
        assert rows[(q, 1)]["neighbor_id"] == 100 + q
        assert rows[(q, 1)]["cosine"] > 0.99
    # k respected
    assert out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] == 3


def test_embedding_near_dup_pairs(vectors):
    pairs = ann.embedding_near_dup_pairs(vectors, dim=16, threshold=0.95,
                                         bits=6, tables=8)
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    expected = {(100 + i, i) for i in range(5)}
    assert expected <= got


def test_lsh_topk_recall_vs_exact(vectors):
    queries = vectors.filter("vec_id < 5")
    exact = ann.cosine_topk(vectors, queries, k=1)
    approx = ann.lsh_topk(vectors, queries, dim=16, k=1, bits=4, tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # near-dup neighbors are nearly collinear -> LSH must find them
    assert len(e & a) >= 4


def test_near_dup_bucket_cap_drops_degenerate_bucket(spark):
    """A degenerate cell (many identical vectors) must be dropped at the
    bucket cap instead of fanning out quadratically."""
    import numpy as np

    rng = np.random.RandomState(5)
    v = (rng.normal(size=8)).tolist()
    rows = [(i, v) for i in range(30)]  # 30 identical vectors -> one bucket
    w = rng.normal(size=8)
    rows += [(100, (w / np.linalg.norm(w)).tolist()),
             (101, ((w + rng.normal(scale=0.01, size=8))).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cap below 30: the identical-vector bucket is dropped entirely,
    # the small near-dup pair (101,100) survives
    pairs = ann.embedding_near_dup_pairs(
        df, dim=8, threshold=0.95, bits=6, tables=4, bucket_cap=10
    )
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    assert (101, 100) in got
    assert not any(a < 100 and b < 100 for a, b in got)
    # without the cap the degenerate bucket pairs up quadratically
    uncapped = ann.embedding_near_dup_pairs(
        df, dim=8, threshold=0.95, bits=6, tables=4, bucket_cap=2000
    ).count()
    assert uncapped >= 30 * 29 // 2


def test_lsh_topk_null_query_vectors_are_dropped(spark, vectors):
    """r3 (ADVICE r2): a query row with a null embedding used to hash to
    bucket 0, emit candidates, and then mis-index the collected query
    matrix in the score kernel. Null-vector queries (and corpus rows)
    must simply be absent from the output."""
    queries = vectors.filter("vec_id < 3").select("vec_id", "embedding").union(
        spark.createDataFrame([(999, None)], "vec_id long, embedding array<double>")
    )
    corpus = vectors.union(
        spark.createDataFrame([(998, None)], "vec_id long, embedding array<double>")
    )
    out = ann.lsh_topk(corpus, queries, dim=16, k=2, bits=4, tables=8).collect()
    qids = {r["query_id"] for r in out}
    nids = {r["neighbor_id"] for r in out}
    assert 999 not in qids and 998 not in nids
    assert qids <= {0, 1, 2} and len(qids) == 3


def test_collect_matrix_guard_trips(spark):
    """r4 (VERDICT r3 #2): pointing the query/oracle side at a table
    bigger than the collect ceiling must fail fast with a diagnosed
    error naming the bucketed alternative, not a driver OOM."""
    import pytest
    from pyspark.sql import functions as F

    big = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="embedding_near_dup_pairs"):
        ann._collect_matrix(big, "vec_id", "embedding", max_rows=100,
                            caller="cosine_topk (query side)")
    # under the limit: collects fine
    ids, M = ann._collect_matrix(big, "vec_id", "embedding", max_rows=500)
    assert len(ids) == 200 and M.shape == (200, 2)


# ---------------------------------------------------------------------------
# IVF (trained coarse quantizer) — round 4
# ---------------------------------------------------------------------------

def test_ivf_topk_planted_neardups(vectors):
    """nprobe=2 of 8 lists must still put each planted near-dup at rank 1 —
    a ~0.9999-cosine twin always quantizes to the same list as its query."""
    queries = vectors.filter("vec_id < 5")
    out = ann.ivf_topk(vectors, queries, k=3, n_lists=8, nprobe=2, seed=11)
    rows = {(r["query_id"], r["rank"]): r for r in out.collect()}
    for q in range(5):
        assert rows[(q, 1)]["neighbor_id"] == 100 + q
        assert rows[(q, 1)]["cosine"] > 0.99


def test_ivf_topk_full_probe_equals_exact(vectors):
    """nprobe >= n_lists probes every list: IVF must equal cosine_topk
    bit-for-bit (same deterministic tiebreak) — the exactness anchor."""
    queries = vectors.filter("vec_id < 5")
    exact = ann.cosine_topk(vectors, queries, k=4)
    ivf = ann.ivf_topk(vectors, queries, k=4, n_lists=6, nprobe=6, seed=11)
    e = sorted(map(tuple, exact.collect()))
    a = sorted(map(tuple, ivf.collect()))
    assert [(q, n, round(c, 9), r) for q, n, c, r in e] == \
           [(q, n, round(c, 9), r) for q, n, c, r in a]


def test_ivf_train_deterministic(vectors):
    C1 = ann.ivf_train(vectors, n_lists=8, seed=11)
    C2 = ann.ivf_train(vectors, n_lists=8, seed=11)
    assert np.array_equal(C1, C2)
    assert C1.shape == (8, 16)
    # centroids are unit-norm (spherical k-means)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)


def test_ivf_assign_covers_corpus(vectors):
    C = ann.ivf_train(vectors, n_lists=8, seed=11)
    assigned = ann.ivf_assign(vectors, C)
    assert assigned.count() == vectors.count()
    lists = {r["list_id"] for r in assigned.select("list_id").distinct().collect()}
    assert lists <= set(range(8))


def test_ivf_query_guard_trips(vectors):
    """The IVF query side goes through the same count-gated collect as
    cosine_topk/lsh_topk: an over-ceiling query table is a diagnosed
    ValueError naming the caller, not a driver OOM."""
    with pytest.raises(ValueError, match="ivf_topk"):
        ann._collect_matrix(vectors, "vec_id", "embedding", max_rows=10,
                            caller="ivf_topk (query side)")


def test_ivf_train_layout_independent(spark):
    """The trained centroids must not depend on partition layout: Bernoulli
    sample() seeds per-partition and limit() takes arrival order, so the
    subset is now the lowest-hash-ranked rows (session-8 review fix)."""
    import numpy as np

    from recordlinkage_spark import ann

    rows = [
        (i, [float((i * 7 + j) % 13) + 0.1 for j in range(4)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    c1 = ann.ivf_train(df.repartition(2), n_lists=4, sample_rows=80, seed=7)
    c2 = ann.ivf_train(df.repartition(11), n_lists=4, sample_rows=80, seed=7)
    assert np.allclose(c1, c2)


def test_ivf_train_null_heavy_corpus_samples_fully(spark):
    """The sample-sizing `total` is computed on the NULL-FILTERED frame
    (ADVICE r4): on a null-heavy corpus the old raw count over-sized the
    hash-threshold prefilter's denominator and kept materially fewer than
    sample_rows vectors. With the fix, training over nulls+vectors equals
    training over the null-free frame exactly."""
    import numpy as np

    from recordlinkage_spark import ann

    good = [
        (i, [float((i * 7 + j) % 13) + 0.1 for j in range(4)])
        for i in range(150)
    ]
    nulls = [(1000 + i, None) for i in range(850)]
    schema = "vec_id bigint, embedding array<double>"
    with_nulls = spark.createDataFrame(good + nulls, schema)
    null_free = spark.createDataFrame(good, schema)
    c1 = ann.ivf_train(with_nulls, n_lists=4, sample_rows=100, seed=7)
    c2 = ann.ivf_train(null_free, n_lists=4, sample_rows=100, seed=7)
    assert np.allclose(c1, c2)


def test_lsh_buckets_null_vectors_excluded(spark):
    """Null vectors must not hash to bucket 0 of every table — they would
    only inflate those buckets toward the cap (session-8 review fix)."""
    from recordlinkage_spark import ann

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "vec_id bigint, embedding array<double>"
    )
    out = ann.lsh_buckets(df, dim=2, bits=4, tables=2)
    assert {r["id"] for r in out.collect()} == {1}
