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


# ---------------------------------------------------------------------------
# pack_sequences (concat-and-chunk packing)
# ---------------------------------------------------------------------------

def _expected_layout(rows, budget):
    """Reference layout: per shard, docs in (order_bucket, key) order laid
    end-to-end, chunk cut every `budget` tokens."""
    out = {}
    by_shard = {}
    for key, shard, bucket, tok in rows:
        by_shard.setdefault(shard, []).append((bucket, key, tok))
    for shard, docs in by_shard.items():
        cum = 0
        for bucket, key, tok in sorted(docs):
            out[key] = (shard, cum // budget, cum % budget,
                        cum % budget + tok > budget)
            cum += tok
    return out


def test_pack_sequences_exact_layout(spark):
    from recordlinkage_spark.sharding import pack_sequences, portable_hash60

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 1).alias("n_tok"),
    )
    out = pack_sequences(
        docs, "doc_id", "n_tok", budget=40, n_shards=4,
        salt="p", hash_fn="md5",
    ).collect()

    # rebuild the reference layout from the same hash primitives
    probe = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 1).alias("n_tok"),
        F.pmod(portable_hash60(F.col("id"), "p"), F.lit(4)).alias("shard"),
        F.pmod(
            portable_hash60(F.col("id"), "p#order"), F.lit(1_000_000)
        ).alias("bucket"),
    ).collect()
    want = _expected_layout(
        [(r["doc_id"], r["shard"], r["bucket"], r["n_tok"]) for r in probe],
        budget=40,
    )
    assert len(out) == 300
    for r in out:
        ws, wp, wpos, wspan = want[r["doc_id"]]
        assert (r["shard"], r["pack_id"], r["pack_pos"], r["spans_boundary"]) \
            == (ws, wp, wpos, wspan), r["doc_id"]


def test_pack_sequences_partition_independent(spark):
    from recordlinkage_spark.sharding import pack_sequences

    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("n_tok")
    )
    a = pack_sequences(docs, "doc_id", "n_tok", 32, n_shards=8, salt="q")
    b = pack_sequences(
        docs.repartition(7), "doc_id", "n_tok", 32, n_shards=8, salt="q"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # spans flag is internally consistent everywhere
    bad = a.filter(
        (F.col("pack_pos") + F.col("n_tok") > 32) != F.col("spans_boundary")
    ).count()
    assert bad == 0


def test_pack_sequences_validates(spark):
    from recordlinkage_spark.sharding import pack_sequences

    docs = spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("t"))
    with pytest.raises(ValueError):
        pack_sequences(docs, "k", "t", 0)


# ---------------------------------------------------------------------------
# select_by_budget (quality-ranked token-budget selection)
# ---------------------------------------------------------------------------

def _budget_docs(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 101).cast("double").alias("score"),
        (F.col("id") % 23 + 5).alias("n_tok"),
    )


def test_select_by_budget_exact_closed_form(spark):
    from recordlinkage_spark.sharding import select_by_budget

    docs = _budget_docs(spark)
    budget = 1500
    out = sorted(
        r["doc_id"]
        for r in select_by_budget(
            docs, "doc_id", "score", "n_tok", budget, mode="exact"
        ).collect()
    )
    rows = [(i, i * 37 % 101, i % 23 + 5) for i in range(400)]
    want, cum = [], 0
    for did, sc, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum < budget:
            want.append(did)
        cum += tok
    assert out == sorted(want)
    # the boundary-straddling doc is kept: selected mass >= budget
    sel_mass = sum(tok for did, sc, tok in rows if did in set(want))
    assert sel_mass >= budget


def test_select_by_budget_threshold_accuracy(spark):
    from recordlinkage_spark.sharding import select_by_budget

    docs = _budget_docs(spark)
    total = sum(i % 23 + 5 for i in range(400))
    budget = total // 3
    out = select_by_budget(
        docs, "doc_id", "score", "n_tok", budget,
        mode="threshold", n_bins=64, salt="b",
    )
    rows = {r["doc_id"]: (r["score"], r["n_tok"]) for r in out.collect()}
    sel_mass = sum(t for _, t in rows.values())
    # per-bin mass bound: 64 bins over 400 docs * <=27 tok
    bin_bound = total / 64 * 4 + 27
    assert abs(sel_mass - budget) <= bin_bound
    # every doc in a bin strictly above the boundary bin is kept
    scores = [float(i * 37 % 101) for i in range(400)]
    lo, hi = min(scores), max(scores)
    width = (hi - lo) / 64

    def bin_of(s):
        return min(63, int((hi - s) // width))

    boundary = max(bin_of(s) for s, _ in rows.values())
    missed = [
        i for i in range(400)
        if bin_of(scores[i]) < boundary and i not in rows
    ]
    assert missed == []
    # deterministic under repartition
    out2 = select_by_budget(
        docs.repartition(7), "doc_id", "score", "n_tok", budget,
        mode="threshold", n_bins=64, salt="b",
    )
    assert out.exceptAll(out2).count() == 0
    assert out2.exceptAll(out).count() == 0


def test_select_by_budget_edges(spark):
    from recordlinkage_spark.sharding import select_by_budget

    docs = _budget_docs(spark, 50)
    total = sum(i % 23 + 5 for i in range(50))
    # budget >= total keeps everything (threshold mode short-circuits)
    assert select_by_budget(
        docs, "doc_id", "score", "n_tok", total, mode="threshold"
    ).count() == 50
    # zero budget keeps nothing in exact mode
    assert select_by_budget(
        docs, "doc_id", "score", "n_tok", 0, mode="exact"
    ).count() == 0
    with pytest.raises(ValueError):
        select_by_budget(docs, "doc_id", "score", "n_tok", -1)
    with pytest.raises(ValueError):
        select_by_budget(docs, "doc_id", "score", "n_tok", 10, mode="nope")


# ---------------------------------------------------------------------------
# cap_per_group (per-domain contribution caps)
# ---------------------------------------------------------------------------

def test_cap_per_group_ordered(spark):
    from recordlinkage_spark.sharding import cap_per_group

    rows = [(i, f"host{i % 5}", float(i * 13 % 31)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, host string, score double")
    out = cap_per_group(
        df, "host", "doc_id", cap=4, order_col="score"
    ).collect()
    assert len(out) == 20
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append((r["score"], r["doc_id"]))
    # closed form: per host, top-4 by (score desc, doc_id asc)
    want = {}
    for did, host, score in rows:
        want.setdefault(host, []).append((-score, did))
    for host, lst in want.items():
        top = sorted(lst)[:4]
        got = sorted((-s, d) for s, d in by_host[host])
        assert got == top, host


def test_cap_per_group_hash_order_deterministic(spark):
    from recordlinkage_spark.sharding import cap_per_group

    rows = [(i, f"h{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    a = cap_per_group(df, "host", "doc_id", cap=10, salt="z")
    b = cap_per_group(df.repartition(8), "host", "doc_id", cap=10, salt="z")
    assert a.count() == 30
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # groups under the cap keep everything
    small = cap_per_group(df.filter("doc_id < 9"), "host", "doc_id", cap=10)
    assert small.count() == 9
    with pytest.raises(ValueError):
        cap_per_group(df, "host", "doc_id", cap=0)


# ---------------------------------------------------------------------------
# mix_corpora (weighted multi-source mixing)
# ---------------------------------------------------------------------------

def _mk_source(spark, n, tok, prefix):
    return spark.range(0, n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("doc_id"),
        F.lit(tok).alias("n_tok"),
    )


def test_mix_corpora_proportions(spark):
    from recordlinkage_spark.sharding import mix_corpora

    web = _mk_source(spark, 8000, 10, "w")     # 80k tokens available
    code = _mk_source(spark, 4000, 10, "c")    # 40k tokens available
    out = mix_corpora(
        {"web": web, "code": code}, "doc_id", "n_tok",
        weights={"web": 3, "code": 1}, total_budget=40000, salt="m",
    )
    got = {
        r["mix_source"]: r["t"]
        for r in out.groupBy("mix_source")
        .agg(F.sum("n_tok").alias("t")).collect()
    }
    # targets: web 30k of 80k (rate .375), code 10k of 40k (rate .25)
    assert got["web"] == pytest.approx(30000, rel=0.05)
    assert got["code"] == pytest.approx(10000, rel=0.05)


def test_mix_corpora_shortfall_and_nesting(spark):
    from recordlinkage_spark.sharding import mix_corpora

    web = _mk_source(spark, 1000, 10, "w")     # only 10k tokens
    code = _mk_source(spark, 4000, 10, "c")
    kw = dict(weights={"web": 1, "code": 1}, salt="m2")
    out = mix_corpora(
        {"web": web, "code": code}, "doc_id", "n_tok",
        total_budget=60000, **kw,
    )
    got = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # web's 30k target exceeds its 10k mass -> kept whole, no redistribution
    assert got["web"] == 1000
    assert got["code"] == pytest.approx(3000, rel=0.05)
    # nesting: a smaller budget's mix is a subset of a larger one
    small = mix_corpora(
        {"web": web, "code": code}, "doc_id", "n_tok",
        total_budget=20000, **kw,
    )
    assert small.exceptAll(out).count() == 0


def test_mix_corpora_validates(spark):
    from recordlinkage_spark.sharding import mix_corpora

    web = _mk_source(spark, 10, 5, "w")
    with pytest.raises(ValueError):
        mix_corpora({"web": web}, "doc_id", "n_tok", {"other": 1}, 100)
    with pytest.raises(ValueError):
        mix_corpora({"web": web}, "doc_id", "n_tok", {"web": 1}, -5)
    with pytest.raises(ValueError):
        mix_corpora({}, "doc_id", "n_tok", {}, 100)


def test_select_by_budget_nan_null_scores_excluded(spark):
    """One NaN score must not poison the threshold histogram (NaN sorts
    above every double, so max() returns NaN and every doc lands in one
    bin), and must not rank first in exact mode: null/NaN-score rows are
    excluded from selection in both modes (session-8 review fix)."""
    from recordlinkage_spark.sharding import select_by_budget

    docs = _budget_docs(spark, 40)
    poison = spark.createDataFrame(
        [(1000, float("nan"), 10), (1001, None, 10)],
        "doc_id bigint, score double, n_tok bigint",
    )
    poisoned = docs.unionByName(poison)
    for mode in ("exact", "threshold"):
        clean = {
            r["doc_id"]
            for r in select_by_budget(
                docs, "doc_id", "score", "n_tok", 200, mode=mode
            ).collect()
        }
        got = {
            r["doc_id"]
            for r in select_by_budget(
                poisoned, "doc_id", "score", "n_tok", 200, mode=mode
            ).collect()
        }
        assert got == clean, mode
        assert 1000 not in got and 1001 not in got
