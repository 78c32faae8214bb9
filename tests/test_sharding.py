"""Deterministic sharding / split / sample operators (sharding.py).

The contract under test: assignments are pure functions of (key, salt) —
independent of partitioning, run order, and cluster size — the md5 flavor
is bit-portable to DuckDB (what the driver oracle relies on), samples are
nested under budget growth, and a cluster-aware split never places two
members of one dedup cluster on opposite sides of the train/eval boundary.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.sharding import (
    BUCKETS,
    cluster_aware_split,
    deterministic_sample,
    deterministic_split,
    portable_hash60,
    shard_assign,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 5000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key"),
        (F.col("id") % 7).alias("grp"),
    )


def test_portable_hash_matches_duckdb(spark, keys):
    got = {
        r["key"]: r["h"]
        for r in keys.limit(64)
        .select("key", portable_hash60(F.col("key"), salt="s1").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for k, h in got.items():
        (want,) = con.execute(
            "select ('0x' || substr(md5(? || 's1'), 1, 15))::BIGINT", [k]
        ).fetchone()
        assert h == want, k


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_shard_assign_deterministic_and_partition_independent(spark, keys, hash_fn):
    a = shard_assign(keys, "key", 16, hash_fn=hash_fn)
    b = shard_assign(keys.repartition(13, "grp"), "key", 16, hash_fn=hash_fn)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    shards = a.groupBy("shard").count().collect()
    assert {r["shard"] for r in shards} == set(range(16))
    counts = [r["count"] for r in shards]
    # 5000 keys over 16 shards: uniform ±40% is a generous but real bound
    assert max(counts) < 1.4 * (5000 / 16)
    assert min(counts) > 0.6 * (5000 / 16)


def test_shard_assign_validates(spark, keys):
    with pytest.raises(ValueError):
        shard_assign(keys, "key", 0)
    with pytest.raises(ValueError):
        shard_assign(keys, "key", 4, hash_fn="sha1")


def test_split_weights_and_coverage(spark, keys):
    out = deterministic_split(
        keys, "key", {"train": 8, "val": 1, "test": 1}, salt="v1"
    )
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    # re-running with the same salt is bit-identical; a new salt reshuffles
    again = deterministic_split(
        keys, "key", {"train": 8, "val": 1, "test": 1}, salt="v1"
    )
    assert out.exceptAll(again).count() == 0
    other = deterministic_split(
        keys, "key", {"train": 8, "val": 1, "test": 1}, salt="v2"
    )
    assert out.exceptAll(other).count() > 0


def test_cluster_aware_split_never_straddles(spark):
    # 1000 docs; docs 0-499 form 50 planted near-dup clusters of 10
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    clusters = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 10).alias("cluster_id"),
    )
    out = cluster_aware_split(
        docs, clusters, "doc_id", {"train": 0.9, "eval": 0.1}, salt="x"
    )
    straddlers = (
        out.groupBy("split_key")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddlers == 0
    # every doc assigned exactly once; singletons hash on their own id
    assert out.count() == 1000
    single = out.filter(F.col("doc_id") >= 500)
    assert single.filter(F.col("split_key") != F.col("doc_id")).count() == 0
    # both splits are populated at the cluster level
    assert out.select("split").distinct().count() == 2


def test_sample_nested_and_fraction(spark, keys):
    s10 = deterministic_sample(keys, "key", 0.1, salt="s")
    s25 = deterministic_sample(keys, "key", 0.25, salt="s")
    n10, n25 = s10.count(), s25.count()
    assert abs(n10 / 5000 - 0.1) < 0.03
    assert abs(n25 / 5000 - 0.25) < 0.03
    # nesting: the 10% sample is a strict subset of the 25% sample
    assert s10.exceptAll(s25).count() == 0
    assert n25 > n10


def test_sample_per_group_fractions(spark, keys):
    out = deterministic_sample(
        keys, "key", by="grp",
        fractions={"0": 1.0, "1": 0.5, "2": 0.0},
        fraction=0.2, salt="g",
    )
    counts = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    per = 5000 / 7
    assert counts[0] == pytest.approx(per, rel=0.01)  # keep-all
    assert 2 not in counts  # drop-all
    assert abs(counts[1] / per - 0.5) < 0.1
    for g in (3, 4, 5, 6):  # default rate applies to unlisted groups
        assert abs(counts[g] / per - 0.2) < 0.12


def test_sample_validates(spark, keys):
    with pytest.raises(ValueError):
        deterministic_sample(keys, "key")
    with pytest.raises(ValueError):
        deterministic_sample(keys, "key", fractions={"0": 0.5})


def test_bucket_space_constant():
    # the driver oracle SQL hard-codes these thresholds; fail loudly if
    # the bucket space ever changes
    assert BUCKETS == 1_000_000
