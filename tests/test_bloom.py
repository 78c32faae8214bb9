"""Bloom incremental dedup (recordlinkage_spark/bloom.py).

Gates:
- no false negatives: every built key probes positive (both the numpy
  kernel and the full Spark build->probe path)
- false-positive rate within 2x of the configured fpp on fresh keys
- dedup_against(exact=True) row-for-row equals the plain left_anti join
  (== SQL NOT EXISTS), incl. null keys, multi-column keys, and the
  count-gated shuffle fallback path
- approx mode is a subset of exact mode and only bloom-FPs differ
- chunked bitmap reassembly (chunk size forced tiny) matches a
  single-partition build bit-for-bit
- sizing guard raises past max_bitmap_bytes naming the alternatives
- probe/negative path plan is shuffle-free
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import bloom
from recordlinkage_spark.bloom import BloomFilter, build_bloom, dedup_against


def _bf(n=1000, fpp=0.01):
    m_bits, k = bloom._sizing(n, fpp)
    return BloomFilter(m_bits=m_bits, k=k,
                       bitmap=np.zeros(m_bits // 8, dtype=np.uint8),
                       expected_items=n, fpp=fpp)


def test_np_kernel_no_false_negatives_and_fpp():
    rng = np.random.default_rng(7)
    members = rng.integers(-2**63, 2**63, size=10_000, dtype=np.int64)
    bf = _bf(n=10_000, fpp=0.01)
    bf.add_np(members)
    assert bf.might_contain_np(members).all()
    fresh = rng.integers(-2**63, 2**63, size=50_000, dtype=np.int64)
    fresh = np.setdiff1d(fresh, members)
    fpr = bf.might_contain_np(fresh).mean()
    assert fpr <= 2 * 0.01, fpr


def test_hypothesis_bloom_kernel_properties():
    """Adversarial int64 key sets (hypothesis shrinks to boundary values
    like -2^63, 0, duplicates): (a) no false negatives ever; (b) adding
    in arbitrary chunks ORs to the same bitmap as adding at once — the
    numpy-level form of partition independence the Spark build relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=200,
    )

    @given(ints, st.integers(min_value=1, max_value=7))
    @settings(max_examples=60, deadline=None)
    def check(keys, n_chunks):
        arr = np.array(keys, dtype=np.int64)
        whole = _bf(n=len(keys), fpp=0.05)
        whole.add_np(arr)
        assert whole.might_contain_np(arr).all()
        parts = _bf(n=len(keys), fpp=0.05)
        for part in np.array_split(arr, min(n_chunks, len(arr))):
            parts.add_np(part)
        assert np.array_equal(whole.bitmap, parts.bitmap)

    check()


def test_sizing_monotone_and_guard():
    m1, _ = bloom._sizing(1000, 0.01)
    m2, _ = bloom._sizing(1000, 0.001)
    assert m2 > m1
    with pytest.raises(ValueError, match="fpp"):
        bloom._sizing(10, 1.5)


def test_build_guard_names_alternatives(spark):
    corpus = spark.range(100).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="candidate_pairs_against"):
        build_bloom(corpus, "k", expected_items=10**9, fpp=1e-6,
                    max_bitmap_bytes=1 << 20)


def test_spark_build_probe_no_false_negatives(spark):
    corpus = spark.range(0, 5000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    ).repartition(8)
    bf = build_bloom(corpus, "k", fpp=0.01)
    assert bf.expected_items == 5000
    flagged = corpus.withColumn("_fp", F.xxhash64("k"))
    flagged = flagged.withColumn(
        "m", bloom._might_contain_col(flagged, bf, "_fp"))
    assert flagged.filter(~F.col("m")).count() == 0


def test_chunked_reassembly_matches_single_partition(spark, monkeypatch):
    # force many tiny chunks AND many partitions; the ORed result must be
    # bit-identical to a 1-partition, 1-chunk build of the same keys
    corpus = spark.range(0, 2000).select(F.col("id").alias("k"))
    ref = build_bloom(corpus.coalesce(1), "k", expected_items=2000, fpp=0.01)
    monkeypatch.setattr(bloom, "_CHUNK_BYTES", 128)
    chunked = build_bloom(corpus.repartition(16), "k",
                          expected_items=2000, fpp=0.01)
    assert chunked.m_bits == ref.m_bits and chunked.k == ref.k
    assert np.array_equal(chunked.bitmap, ref.bitmap)


def _snapshot_frames(spark):
    """corpus = 400 string keys; new = 150 dups + 150 fresh + 2 null-keyed
    + intra-new duplicate rows (which must all survive)."""
    corpus = spark.range(0, 400).select(
        F.col("id").alias("nid"),
        F.concat(F.lit("url-"), F.col("id")).alias("k"),
        F.lit("old").alias("src"),
    )
    dups = spark.range(0, 150).select(
        (F.col("id") + 1000).alias("nid"),
        F.concat(F.lit("url-"), F.col("id") * 2).alias("k"),  # url-0..url-298 even
        F.lit("new").alias("src"),
    )
    fresh = spark.range(0, 150).select(
        (F.col("id") + 2000).alias("nid"),
        F.concat(F.lit("fresh-"), F.col("id") % 75).alias("k"),  # each twice
        F.lit("new").alias("src"),
    )
    nulls = spark.createDataFrame(
        [(3000, None, "new"), (3001, None, "new")],
        "nid bigint, k string, src string",
    )
    return corpus, dups.unionByName(fresh).unionByName(nulls)


def test_exact_mode_equals_anti_join(spark):
    corpus, new = _snapshot_frames(spark)
    got = dedup_against(new, corpus, "k", fpp=0.05)
    want = new.join(corpus.select("k").distinct(), on="k", how="left_anti")
    assert got.count() == want.count() == 152  # 150 fresh + 2 null-keyed
    assert (got.exceptAll(want.select(*got.columns)).count() == 0
            and want.select(*got.columns).exceptAll(got).count() == 0)


def test_exact_mode_shuffle_fallback_path(spark):
    # broadcast_threshold=0 drives every positive through the gated
    # shuffle semi-join; result must be unchanged
    corpus, new = _snapshot_frames(spark)
    got = dedup_against(new, corpus, "k", fpp=0.05, broadcast_threshold=0)
    assert got.count() == 152
    assert got.filter(F.col("k").startswith("url-")).count() == 0


def test_multi_column_keys(spark):
    corpus = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")], "k1 string, k2 int, v string")
    new = spark.createDataFrame(
        [("a", 1, "dup"), ("a", 3, "keep"), ("b", 2, "keep"), ("b", 1, "dup")],
        "k1 string, k2 int, v string")
    got = dedup_against(new, corpus, ["k1", "k2"], fpp=0.01)
    assert sorted(r["v"] for r in got.collect()) == ["keep", "keep"]


def test_approx_mode_subset_of_exact(spark):
    corpus, new = _snapshot_frames(spark)
    bf = build_bloom(corpus, "k", fpp=0.2)  # high fpp to force real FPs
    exact = dedup_against(new, corpus, "k", bf=bf)
    approx = dedup_against(new, corpus, "k", bf=bf, exact=False)
    # approx ⊆ exact, and everything approx dropped beyond exact's drops
    # is a bloom false positive (never a false negative)
    assert approx.exceptAll(exact.select(*approx.columns)).count() == 0
    lost = exact.select(*approx.columns).exceptAll(approx)
    for row in lost.collect():
        assert row["k"] is None or row["k"].startswith("fresh-")


def test_prebuilt_filter_reused_across_snapshots(spark):
    corpus, new = _snapshot_frames(spark)
    bf = build_bloom(corpus, "k", fpp=0.01)
    snap1 = dedup_against(new, corpus, "k", bf=bf)
    snap2 = dedup_against(new.limit(50), corpus, "k", bf=bf)
    assert snap1.count() == 152
    assert snap2.count() <= 50


def test_negative_path_plan_is_shuffle_free(spark):
    corpus, new = _snapshot_frames(spark)
    bf = build_bloom(corpus, "k", fpp=0.01)
    flagged = new.withColumn("_fp", F.xxhash64("k"))
    neg = flagged.withColumn(
        "m", bloom._might_contain_col(flagged, bf, "_fp")
    ).filter(~F.col("m"))
    plan = neg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
