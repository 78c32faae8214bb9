"""Deterministic sharding, sampling, and leakage-safe train/eval splits.

Training-data pipelines need three assignment primitives downstream of
dedup, and all three must be *deterministic functions of a key* — never
RNG state — so that re-running any slice of a 100 TB corpus reproduces
byte-identical assignments and a grown corpus never reshuffles old rows:

- ``shard_assign``: route each row to one of N output shards (training
  shards, writer tasks, curriculum buckets).
- ``deterministic_split``: train/validation/test assignment by weight.
- ``deterministic_sample``: keep a fraction of rows, optionally a
  different fraction per group (e.g. per-language token budgets). Built
  on a hash-threshold rule, so samples are NESTED: the 10% sample is a
  strict subset of the 20% sample under the same salt — growing or
  shrinking a budget never resamples what was already kept.

``cluster_aware_split`` composes the split with a dedup clustering
(e.g. ``network.ConnectedComponents`` output): every member of a
near-duplicate cluster hashes on its CLUSTER key, so no near-dup pair
can straddle train and eval. Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better") measure exactly this leakage mode —
eval prompts whose near-duplicates sit in train — as the largest source
of inflated benchmark numbers; a row-keyed split cannot prevent it, a
cluster-keyed split prevents it by construction.

Scale design (100 TB):

- Every assignment is a pure JVM column expression (md5/xxhash64 +
  pmod + comparison chain): zero Python, zero shuffle — shard/split/
  sample run inline with the Iceberg scan as a projection/filter, and
  writing shards is ``df.write.partitionBy(shard_col)`` with no extra
  exchange beyond the write's own.
- ``cluster_aware_split`` adds exactly one join against the cluster
  table. After dedup the cluster table holds only clustered doc ids
  (singletons are absent and coalesce to their own id), which is
  orders of magnitude smaller than the corpus — AQE broadcasts it;
  the corpus side never shuffles.
- Two hash flavors, same bucket semantics: ``xxhash64`` (default) is
  the cheap JVM path for production; ``md5`` is bit-portable across
  engines (Spark ``conv(substr(md5(k),1,15),16,10)`` equals DuckDB
  ``('0x'||substr(md5(k),1,15))::BIGINT``), which is what lets the
  driver's DuckDB oracle verify assignments hash-exactly.

The reference has no sharding/split surface (its pandas outputs are
small enough to `.sample()` in memory; cf. reference
recordlinkage/datasets/febrl.py:30-80 returning full frames) — these
operators exist because the 10^12-doc target of the north rule makes
assignment-by-hash the only reproducible option.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bucket denominator for split/sample thresholds: 1e6 buckets keeps
# threshold granularity at 1e-6 while staying far below the 60-bit hash
# space (bias from pmod truncation < 2^20/2^60 ~ 1e-12 per bucket).
BUCKETS = 1_000_000


def portable_hash60(key: Column, salt: str = "") -> Column:
    """60-bit hash of ``key`` (cast to string) that computes identically
    in Spark and DuckDB/ANSI SQL: the first 15 hex digits of
    ``md5(key || salt)`` parsed base-16. Used by the oracle-verified
    paths; prefer ``xxhash64`` where cross-engine parity isn't needed."""
    s = F.concat(key.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _bucket(key: Column, salt: str, hash_fn: str) -> Column:
    """Uniform bucket in [0, BUCKETS) from the chosen hash flavor."""
    if hash_fn == "md5":
        return F.pmod(portable_hash60(key, salt), F.lit(BUCKETS))
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(key.cast("string"), F.lit(salt)), F.lit(BUCKETS)
        )
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_col: str = "shard",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``shard_col`` = deterministic shard id in [0, n_shards) keyed
    on ``key_col``. Same key -> same shard on every run, every cluster
    size, every partitioning of the input."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if hash_fn == "md5":
        h = portable_hash60(F.col(key_col), salt)
    elif hash_fn == "xxhash64":
        h = F.xxhash64(F.col(key_col).cast("string"), F.lit(salt))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return df.withColumn(
        shard_col, F.pmod(h, F.lit(n_shards)).cast("int")
    )


def _split_expr(
    key: Column, weights: dict[str, float], salt: str, hash_fn: str
) -> Column:
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bkt = _bucket(key, salt, hash_fn)
    # cumulative integer thresholds over the bucket space; the last split
    # takes everything remaining so rounding never drops a bucket
    names = list(weights)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bkt < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``split_col`` with a weighted deterministic assignment keyed on
    ``key_col``. ``weights`` is ``{name: weight}`` in assignment order
    (weights are normalized; e.g. ``{"train": 8, "val": 1, "test": 1}``).
    Rows with equal keys always land in the same split."""
    return df.withColumn(
        split_col, _split_expr(F.col(key_col), weights, salt, hash_fn)
    )


def cluster_aware_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    weights: dict[str, float],
    cluster_col: str = "cluster_id",
    split_col: str = "split",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Train/eval split that can never leak a near-duplicate across the
    boundary: each row hashes on its dedup CLUSTER key (its own id when
    unclustered), so whole clusters move together.

    ``clusters`` is ``(id_col, cluster_col)`` — the shape
    ``network.ConnectedComponents().compute()`` returns over the
    candidate-pair graph. Docs absent from it (singletons — the vast
    majority after dedup) coalesce to their own id, with zero shuffle on
    the corpus side when the cluster table broadcasts.

    Returns ``docs`` plus ``split_key`` (the key actually hashed) and
    ``split_col``.
    """
    cl = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("_cl")
    )
    out = (
        docs.join(cl, id_col, "left")
        .withColumn("split_key", F.coalesce(F.col("_cl"), F.col(id_col)))
        .drop("_cl")
    )
    return out.withColumn(
        split_col, _split_expr(F.col("split_key"), weights, salt, hash_fn)
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    by: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep rows whose key-bucket falls below ``fraction * BUCKETS``.

    Deterministic (same key+salt -> same verdict forever) and NESTED:
    ``deterministic_sample(df, k, 0.1, salt=s)`` is a strict subset of
    ``deterministic_sample(df, k, 0.2, salt=s)`` — raising a data budget
    only ADDS rows, so downstream caches and checkpoints stay valid.

    Per-group rates: pass ``by`` (a column of group labels) and
    ``fractions`` ``{label: fraction}``; ``fraction`` becomes the default
    for unlisted labels (0.0 when omitted — unlisted groups drop). The
    rate lookup is a literal map expression: no join, no shuffle.
    """
    if fraction is None and not fractions:
        raise ValueError("pass fraction=, or by=/fractions=")
    if fractions and by is None:
        raise ValueError("fractions= requires by=")
    bkt = _bucket(F.col(key_col), salt, hash_fn)
    default = float(fraction) if fraction is not None else 0.0
    if fractions:
        mapping = F.create_map(
            *[F.lit(x) for kv in fractions.items() for x in kv]
        )
        rate = F.coalesce(
            mapping[F.col(by).cast("string")], F.lit(default)
        )
    else:
        rate = F.lit(default)
    return df.filter(bkt < (rate * BUCKETS).cast("long"))
