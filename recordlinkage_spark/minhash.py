"""MinHash + LSH band index — the web-scale candidate-pair pass.

Not in the reference (SURVEY.md §2.2 "new, north_rule"): replaces
Block/SortedNeighbourhood as the blocking stage for 10^12-doc webtext.

Plan shape (all lazy, one pipeline):

  docs --JVM--> distinct shingles -> xxhash64 per shingle (array<bigint>)
       --pandas UDF (numpy, Arrow)--> k MinHash mins -> b band hashes
       --posexplode--> (band_id, band_hash, id)
       --bucket-size cap (skew!)--> self-join on (band_id, band_hash)
       --id_1 > id_2, dropDuplicates--> candidate pairs
       --JVM array_intersect/union on shingle hashes--> exact Jaccard verify

Skew handling (north_rule): webtext boilerplate produces mega-buckets that
would explode quadratically in the self-join. Buckets larger than
``max_bucket_size`` are dropped and COUNTED (truncation is observable in
the metrics dict) — AQE skew-join handles the surviving moderate skew.
Hash functions are multiply-shift over uint64 (a_i odd), the standard
vectorized universal-hash family; the numpy kernel is O(k·m) per doc in one
Arrow batch, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from recordlinkage_spark import textfns

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio mix constant


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, num_perm, dtype=np.int64).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 2**62, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def make_band_udf(num_perm: int, bands: int, rows: int, seed: int = 42):
    """pandas UDF: array<bigint> shingle hashes -> array<bigint> band hashes.

    Signature and banding fused into ONE Arrow pass (SURVEY.md §4.5: fuse
    multi-output UDFs manually instead of chaining Python stages)."""
    if bands * rows != num_perm:
        raise ValueError("num_perm must equal bands * rows")
    a, b = _perm_params(num_perm, seed)

    def batch(hashes: pd.Series) -> pd.Series:
        np.seterr(over="ignore")  # uint64 wraparound IS the hash arithmetic
        # flatten the whole Arrow batch: one (k, N_total) multiply + one
        # segmented min (reduceat) instead of a per-doc Python loop.
        lengths = np.array([0 if h is None else len(h) for h in hashes], dtype=np.int64)
        valid = lengths > 0
        if not valid.any():
            return pd.Series([None] * len(hashes))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h, v in zip(hashes, valid) if v]
        ).view(np.uint64)
        offsets = np.zeros(int(valid.sum()), dtype=np.int64)
        np.cumsum(lengths[valid][:-1], out=offsets[1:])
        # One permutation at a time with CONTIGUOUS scalar multiply+add —
        # numpy's stride-0 broadcast integer multiply is ~40x slower than
        # the contiguous path, so the obvious (k, N) outer product is the
        # wrong shape. Temporary stays at N u64 (~8 MB per million hashes).
        n_valid = len(offsets)
        sig = np.empty((num_perm, n_valid), dtype=np.uint64)
        tmp = np.empty(len(flat), dtype=np.uint64)
        for i in range(num_perm):
            np.multiply(flat, a[i], out=tmp)
            tmp += b[i]
            sig[i] = np.minimum.reduceat(tmp, offsets)
        # combine r rows per band with a mixed polynomial hash
        band = sig.reshape(bands, rows, -1)
        acc = np.zeros((bands, band.shape[2]), dtype=np.uint64)
        for r_i in range(rows):
            acc = acc * _MIX + band[:, r_i, :]
            acc ^= acc >> np.uint64(33)
        acc_i64 = acc.view(np.int64)
        out: list = []
        vi = 0
        for v in valid:
            if v:
                out.append(acc_i64[:, vi].tolist())
                vi += 1
            else:
                out.append(None)
        return pd.Series(out)

    # asNondeterministic stops Catalyst from duplicating the UDF when a
    # filter (incl. the size>0 inferred for posexplode) is pushed below the
    # repartition Exchange — otherwise the signature pass runs TWICE, once
    # on the unpartitioned input.
    return F.pandas_udf(batch, ArrayType(LongType())).asNondeterministic()


class MinHashLSH:
    """MinHash/LSH candidate-pair index with exact-Jaccard verification."""

    def __init__(
        self,
        num_perm: int = 128,
        bands: int = 32,
        rows: int = 4,
        shingle_size: int = 3,
        char_level: bool = False,
        max_bucket_size: int = 2000,
        seed: int = 42,
    ):
        if bands * rows != num_perm:
            raise ValueError("num_perm must equal bands * rows")
        self.num_perm, self.bands, self.rows = num_perm, bands, rows
        self.shingle_size = shingle_size
        self.char_level = char_level
        self.max_bucket_size = max_bucket_size
        self.seed = seed
        self.metrics: dict = {}

    # ------------------------------------------------------------------
    def with_shingles(self, df: DataFrame, text_col: str, out: str = "_sh") -> DataFrame:
        if self.char_level:
            return df.withColumn(
                out,
                textfns.shingle_hashes(
                    textfns.char_shingles(F.col(text_col), self.shingle_size)
                ),
            )
        # arithmetic combine of token hashes — no n-gram string builds
        return textfns.with_word_shingle_hashes(df, text_col, self.shingle_size, out)

    def bands_table(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(id, band_id, band_hash) — one row per non-empty doc per band.

        Repartitions the input when it arrives in fewer partitions than the
        cluster has parallelism (a single small parquet file otherwise pins
        the whole signature pass to ONE task)."""
        dp = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < dp:
            df = df.repartition(dp)
        udf = make_band_udf(self.num_perm, self.bands, self.rows, self.seed)
        sig = (
            self.with_shingles(df, text_col)
            .select(F.col(id_col).alias("id"), udf(F.col("_sh")).alias("_bands"))
            .filter(F.col("_bands").isNotNull())
        )
        return sig.select(
            "id", F.posexplode("_bands").alias("band_id", "band_hash")
        )

    def candidate_pairs(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Bucket-aggregate pair generation: ONE shuffle groups band rows
        into buckets, in-bucket pairs are emitted JVM-side from the
        collected id array, then one distinct.

        This replaces the census + self-join shape (3 reads of the bands
        table + a 12.8M-row persist at 400k docs) with a single
        ``groupBy(band_id, band_hash).collect_list(id)``. The bucket cap is
        a size filter on the aggregated array — oversize (boilerplate)
        buckets are dropped before the quadratic pair expansion, so the
        worst bucket emits at most max_bucket_size^2/2 pairs.
        """
        bands = self.bands_table(df, id_col, text_col)
        buckets = (
            bands.groupBy("band_id", "band_hash")
            .agg(F.collect_list("id").alias("_ids"))
            .filter(
                (F.size("_ids") >= 2) & (F.size("_ids") <= self.max_bucket_size)
            )
        )
        ids = F.col("_ids")
        pair_array = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size(ids) - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size(ids) - 1),
                    lambda j: F.struct(
                        F.greatest(
                            F.element_at(ids, i + 1), F.element_at(ids, j + 1)
                        ).alias("id_1"),
                        F.least(
                            F.element_at(ids, i + 1), F.element_at(ids, j + 1)
                        ).alias("id_2"),
                    ),
                ),
            )
        )
        return (
            buckets.select(F.explode(pair_array).alias("_p"))
            .select("_p.id_1", "_p.id_2")
            .dropDuplicates(["id_1", "id_2"])
        )

    def verified_pairs(
        self,
        df: DataFrame,
        id_col: str,
        text_col: str,
        threshold: float = 0.8,
        keep_jaccard: bool = True,
    ) -> DataFrame:
        """Candidates + exact Jaccard over distinct shingle-hash sets,
        filtered at ``threshold``. The verify math is pure JVM
        (array_intersect / array_union on bigint arrays)."""
        cands = self.candidate_pairs(df, id_col, text_col)
        # persist: otherwise Catalyst inlines the (expensive) shingle
        # expression into both join branches AND the jaccard filter,
        # re-shingling each doc several times per probed pair.
        sh = self.with_shingles(df, text_col).select(
            F.col(id_col).alias("id"), F.col("_sh")
        ).persist()
        j = (
            cands.join(sh.withColumnRenamed("id", "id_1").withColumnRenamed("_sh", "_sh1"), "id_1")
            .join(sh.withColumnRenamed("id", "id_2").withColumnRenamed("_sh", "_sh2"), "id_2")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("_sh1", "_sh2")).cast("double")
                / F.size(F.array_union("_sh1", "_sh2")),
            )
            .filter(F.col("jaccard") >= F.lit(threshold))
        )
        cols = ["id_1", "id_2"] + (["jaccard"] if keep_jaccard else [])
        return j.select(*cols)

    def truncation_metrics(self, df: DataFrame, id_col: str, text_col: str) -> dict:
        """Eagerly measure bucket-cap truncation (for the metrics table)."""
        bands = self.bands_table(df, id_col, text_col)
        sizes = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("_n"))
        row = sizes.agg(
            F.count("*").alias("buckets"),
            F.sum((F.col("_n") > self.max_bucket_size).cast("int")).alias("dropped"),
            F.max("_n").alias("max_bucket"),
        ).collect()[0]
        self.metrics = {
            "buckets": row["buckets"],
            "dropped_buckets": int(row["dropped"] or 0),
            "max_bucket": row["max_bucket"],
        }
        return self.metrics
