"""Graph-op goldens — handwritten pair sets from the reference
(tests/test_network.py:21-90; FIXTURES.md F5)."""

import pytest

from recordlinkage_spark.network import (
    ConnectedComponents,
    OneToManyLinking,
    OneToOneLinking,
)


@pytest.fixture()
def sample_pairs(spark):
    # reference test_network.py input order matters (greedy)
    data = [(1, 1), (2, 2), (3, 3), (3, 4), (3, 5), (4, 4), (5, 5), (6, 5),
            (7, 7), (7, 6), (7, 8)]
    return spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(data)], "id_1 long, id_2 long, seq long"
    )


def test_one_to_one_greedy(sample_pairs):
    out = OneToOneLinking().compute(sample_pairs)
    got = sorted((r["id_1"], r["id_2"]) for r in out.collect())
    # sequential greedy: keep a pair iff neither endpoint seen
    # (1,1),(2,2),(3,3) kept; (3,4),(3,5) dropped (3 seen); (4,4),(5,5) kept;
    # (6,5) dropped (5 seen); (7,7) kept; (7,6),(7,8) dropped (7 seen)
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (7, 7)]


def test_one_to_many_level0(sample_pairs):
    out = OneToManyLinking(level=0).compute(sample_pairs)
    got = sorted((r["id_1"], r["id_2"]) for r in out.collect())
    # keep first pair per id_1
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 5), (7, 7)]


def test_one_to_many_level1(sample_pairs):
    out = OneToManyLinking(level=1).compute(sample_pairs)
    got = sorted((r["id_1"], r["id_2"]) for r in out.collect())
    # keep first pair per id_2
    assert got == [(1, 1), (2, 2), (3, 3), (3, 4), (3, 5), (7, 6), (7, 7), (7, 8)]


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (5, 7), (8, 9)], "id_1 long, id_2 long"
    )
    out = ConnectedComponents().compute(pairs)
    comp = {r["id"]: r["cluster_id"] for r in out.collect()}
    # components {1,2,3,4} {5,6,7} {8,9}, labelled by min id
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 8, 9: 8}


def test_connected_components_chain(spark):
    # long path exercises multiple label-propagation iterations
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_1 long, id_2 long"
    )
    out = ConnectedComponents(max_iter=100).compute(pairs)
    comp = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_connected_components_driver_vs_loop_equivalence(spark):
    """The driver fast path and the distributed loop must give identical
    cluster assignments on a random graph (and on string ids)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randint(0, 120), rng.randint(0, 120)) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_1 long, id_2 long")
    fast = ConnectedComponents().compute(pairs)
    loop = ConnectedComponents(driver_threshold=0).compute(pairs)
    assert {(r["id"], r["cluster_id"]) for r in fast.collect()} == {
        (r["id"], r["cluster_id"]) for r in loop.collect()
    }

    spairs = spark.createDataFrame(
        [(f"u{a:03d}", f"u{b:03d}") for a, b in edges], "id_1 string, id_2 string"
    )
    sfast = ConnectedComponents().compute(spairs)
    sloop = ConnectedComponents(driver_threshold=0).compute(spairs)
    assert {(r["id"], r["cluster_id"]) for r in sfast.collect()} == {
        (r["id"], r["cluster_id"]) for r in sloop.collect()
    }


def test_connected_components_long_path_pointer_jumping(spark):
    """Path of length 250 (diameter 250 > max_iter 50): converges only
    because each iteration also pointer-jumps (O(log d) rounds)."""
    n = 250
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_1 long, id_2 long"
    )
    out = ConnectedComponents(max_iter=50, driver_threshold=0).compute(pairs)
    comp = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_connected_components_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_1 long, id_2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        ConnectedComponents(max_iter=2, driver_threshold=0).compute(pairs)


def test_one_to_one_hybrid_tail_switch(spark):
    """Wave loop that hands the small tail to the driver path must equal
    the pure driver result."""
    import random

    rng = random.Random(23)
    rows = []
    for s in range(300):
        a, b = rng.randint(0, 80), rng.randint(0, 80)
        if a != b:
            rows.append((a, b, s))
    pairs = spark.createDataFrame(rows, "id_1 long, id_2 long, seq long")
    fast = OneToOneLinking().compute(pairs)
    # threshold below the input size -> at least one distributed wave,
    # then the driver finishes the tail
    hybrid = OneToOneLinking(driver_threshold=40).compute(pairs)
    assert {(r["id_1"], r["id_2"]) for r in fast.collect()} == {
        (r["id_1"], r["id_2"]) for r in hybrid.collect()
    }


def test_one_to_one_driver_vs_wave_equivalence(spark):
    """Driver sequential greedy == distributed wave fixpoint on a random
    pair set (both must equal the reference's order-dependent greedy)."""
    import random

    rng = random.Random(11)
    # OVERLAPPING id spaces (dedup-style): the reference tracks the two
    # levels in separate sets, so an id may appear once per side —
    # disjoint spaces would not exercise that
    rows = []
    for s in range(300):
        a, b = rng.randint(0, 80), rng.randint(0, 80)
        if a != b:
            rows.append((a, b, s))
    pairs = spark.createDataFrame(rows, "id_1 long, id_2 long, seq long")
    fast = OneToOneLinking().compute(pairs)
    wave = OneToOneLinking(driver_threshold=0).compute(pairs)
    assert {(r["id_1"], r["id_2"]) for r in fast.collect()} == {
        (r["id_1"], r["id_2"]) for r in wave.collect()
    }


def test_one_to_one_chunked_equals_driver(spark):
    """r3: the rank-range chunked path (driver_threshold forces tiny
    chunks) must match the one-shot exact greedy bit-for-bit."""
    import numpy as np

    rng = np.random.RandomState(17)
    rows = [
        (int(rng.randint(0, 60)), int(rng.randint(100, 160)), i)
        for i in range(800)
    ]
    pairs = spark.createDataFrame(rows, "id_1 long, id_2 long, seq long").filter(
        "id_1 != id_2"
    )
    exact = OneToOneLinking(driver_threshold=10**9).compute(pairs)
    chunked = OneToOneLinking(driver_threshold=50).compute(pairs)
    e = {(r["id_1"], r["id_2"], r["seq"]) for r in exact.collect()}
    c = {(r["id_1"], r["id_2"], r["seq"]) for r in chunked.collect()}
    assert e == c and len(e) > 0


def test_one_to_one_prewave_equals_driver(spark):
    """r4: the distributed wave pre-prune (run before every driver pull)
    must leave the chunked result bit-identical to one-shot greedy."""
    import numpy as np

    rng = np.random.RandomState(29)
    rows = [
        (int(rng.randint(0, 60)), int(rng.randint(0, 60)), i)
        for i in range(800)
    ]
    pairs = spark.createDataFrame(
        rows, "id_1 long, id_2 long, seq long"
    ).filter("id_1 != id_2")
    exact = OneToOneLinking(driver_threshold=10**9).compute(pairs)
    waved = OneToOneLinking(
        driver_threshold=50, prewave_min_rows=0
    ).compute(pairs)
    e = {(r["id_1"], r["id_2"], r["seq"]) for r in exact.collect()}
    w = {(r["id_1"], r["id_2"], r["seq"]) for r in waved.collect()}
    assert e == w and len(e) > 0
    assert exact.exceptAll(waved).count() == 0
    assert waved.exceptAll(exact).count() == 0


class TestSelectRepresentatives:
    def _fixtures(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        clusters = spark.createDataFrame(
            [("a1", "a1"), ("a2", "a1"), ("a3", "a1"), ("b1", "b1"), ("b2", "b1")],
            "doc_id string, cluster_id string",
        )
        attrs = spark.createDataFrame(
            [
                ("a1", 0.2, 100), ("a2", 0.9, 50), ("a3", 0.9, 70),
                ("b1", 0.5, 10), ("b2", 0.5, 10),
                ("lone", 0.1, 5),   # never clustered -> self-representative
            ],
            "doc_id string, quality double, n_chars long",
        )
        return clusters, attrs

    def test_keep_policy(self, spark):
        from pyspark.sql import functions as F

        from recordlinkage_spark.network import select_representatives

        clusters, attrs = self._fixtures(spark)
        out = select_representatives(
            clusters, attrs, id_col="doc_id",
            order_cols=[F.desc("quality"), F.desc("n_chars")],
        )
        reps = {r["doc_id"] for r in out.filter("is_representative").collect()}
        # a-cluster: quality tie a2/a3 at 0.9 -> longer a3 wins; b-cluster:
        # full tie -> id-ascending tiebreak keeps b1; singleton keeps itself
        assert reps == {"a3", "b1", "lone"}

    def test_exactly_one_per_cluster_and_all_rows_kept(self, spark):
        from pyspark.sql import functions as F

        from recordlinkage_spark.network import select_representatives

        clusters, attrs = self._fixtures(spark)
        out = select_representatives(
            clusters, attrs, id_col="doc_id", order_cols=[F.desc("quality")]
        )
        assert out.count() == attrs.count()
        per = out.groupBy("cluster_id").agg(
            F.sum(F.col("is_representative").cast("int")).alias("n")
        )
        assert per.filter("n != 1").count() == 0

    def test_default_order_is_min_id(self, spark):
        from recordlinkage_spark.network import select_representatives

        clusters, attrs = self._fixtures(spark)
        out = select_representatives(clusters, attrs, id_col="doc_id")
        reps = {r["doc_id"] for r in out.filter("is_representative").collect()}
        assert reps == {"a1", "b1", "lone"}


def test_one_to_many_tie_deterministic(spark):
    """Equal order_col values must resolve by (id_1, id_2), not partition
    arrival order (session-8 review fix)."""
    from recordlinkage_spark.network import OneToManyLinking

    rows = [(1, j, 7) for j in range(20, 0, -1)]  # all seq tied
    for parts in (2, 7):
        pairs = spark.createDataFrame(
            rows, "id_1 int, id_2 int, seq int"
        ).repartition(parts)
        got = OneToManyLinking(level=0).compute(pairs).collect()
        assert len(got) == 1 and got[0]["id_2"] == 1


def test_cc_driver_raises_on_non_convergence(spark):
    """The driver fast path must fail loudly like the distributed loop
    instead of returning a partial labeling (session-8 review fix)."""
    import pytest as _pytest

    from recordlinkage_spark.network import ConnectedComponents

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_1 int, id_2 int"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        ConnectedComponents(max_iter=1).compute(edges).collect()
