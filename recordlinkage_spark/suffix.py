"""Long-span exact-substring dedup via winnowed rolling-hash fingerprints.

Not in the reference (SURVEY.md §2.2 "new") — handles the north rule's
"exact long-span duplicates" clause. A per-partition suffix array cannot
see cross-partition duplicates; the scalable equivalent is document
fingerprinting (Schleimer/Wilkerson/Aiken 2003, "winnowing"):

  tokens -> xxhash64 per token (JVM) -> rolling polynomial hash of every
  ``span_tokens``-token window (numpy) -> winnowing: keep the min hash of
  each ``winnow_window`` consecutive windows -> explode -> equi-join on the
  fingerprint.

Guarantee: any exact common token span of length >= span_tokens +
winnow_window - 1 shares at least one selected fingerprint, so with the
defaults (32, 19) every shared 50-token span is caught — deterministically,
not probabilistically. Optional exact verification computes the true
longest common token run per candidate pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from recordlinkage_spark import textfns

_P = np.uint64(1099511628211)  # FNV-ish odd multiplier for the rolling hash


def make_fingerprint_udf(span: int, window: int):
    """pandas UDF: array<bigint> token hashes -> array<bigint> winnowed
    window fingerprints (distinct)."""

    # P is odd -> invertible mod 2^64, so the rolling hash vectorizes:
    #   H_i = P^(i+span-1) * (T_{i+span} - T_i),  T_k = sum_{j<k} h_j * P^(-j)
    # all arithmetic uint64-wraparound. No per-token Python loop.
    p_inv = np.uint64(pow(int(_P), -1, 2**64))

    def batch(hashes: pd.Series) -> pd.Series:
        np.seterr(over="ignore")  # uint64 wraparound is the hash function
        out = []
        for h in hashes:
            if h is None or len(h) < span:
                out.append(None)
                continue
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            n = len(hv)
            m = n - span + 1
            # powers of P and P^-1 via cumulative product (wraparound)
            invp = np.ones(n, dtype=np.uint64)
            invp[1:] = p_inv
            np.multiply.accumulate(invp, out=invp)          # P^-j
            t = np.zeros(n + 1, dtype=np.uint64)
            np.cumsum(hv * invp, out=t[1:])                 # T_k (wraps)
            pw_fwd = np.ones(m, dtype=np.uint64)
            pw_fwd[0] = _P
            for _ in range(span - 2):                       # P^(span-1)
                pw_fwd[0] = pw_fwd[0] * _P
            pw_fwd[1:] = _P
            np.multiply.accumulate(pw_fwd, out=pw_fwd)      # P^(i+span-1)
            roll = pw_fwd * (t[span:] - t[:m])
            # winnowing: min of each window of `window` consecutive hashes
            if m <= window:
                sel = np.array([roll.min()], dtype=np.uint64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(roll, window)
                sel = sw.min(axis=1)
            out.append(np.unique(sel).view(np.int64).tolist())
        return pd.Series(out)

    # see minhash.make_band_udf: prevents duplicate evaluation on pushdown
    return F.pandas_udf(batch, ArrayType(LongType())).asNondeterministic()


class FingerprintSubstring:
    """Exact long-span duplicate pass."""

    def __init__(self, span_tokens: int = 32, winnow_window: int = 19,
                 max_bucket_size: int = 2000):
        self.span_tokens = span_tokens
        self.winnow_window = winnow_window
        self.max_bucket_size = max_bucket_size

    def fingerprints(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        dp = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < dp:
            df = df.repartition(dp)
        tok_hashes = textfns.shingle_hashes(textfns.tokens(F.col(text_col)))
        udf = make_fingerprint_udf(self.span_tokens, self.winnow_window)
        fp = df.select(
            F.col(id_col).alias("id"), udf(tok_hashes).alias("_fps")
        ).filter(F.col("_fps").isNotNull())
        return fp.select("id", F.explode("_fps").alias("fp"))

    def candidate_pairs(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        # persisted: feeds the bucket census and both self-join sides
        fps = self.fingerprints(df, id_col, text_col).persist()
        sizes = fps.groupBy("fp").agg(F.count("*").alias("_n"))
        fps = fps.join(
            sizes.filter(F.col("_n") <= self.max_bucket_size).select("fp"), "fp"
        )
        left = fps.withColumnRenamed("id", "id_1")
        right = fps.withColumnRenamed("id", "id_2")
        return (
            left.join(right, "fp")
            .filter(F.col("id_1") > F.col("id_2"))
            .select("id_1", "id_2")
            .dropDuplicates(["id_1", "id_2"])
        )

    def verified_pairs(self, df: DataFrame, id_col: str, text_col: str,
                       min_span: int | None = None) -> DataFrame:
        """Candidates + exact longest-common-token-run verification
        (numpy DP per pair in one Arrow batch)."""
        min_span = min_span or self.span_tokens
        cands = self.candidate_pairs(df, id_col, text_col)
        # persist: see minhash.verified_pairs — avoid token-hash expression
        # inlining into the join branches
        toks = df.select(
            F.col(id_col).alias("id"),
            textfns.shingle_hashes(textfns.tokens(F.col(text_col))).alias("_t"),
        ).persist()
        joined = (
            cands.join(toks.withColumnRenamed("id", "id_1").withColumnRenamed("_t", "_t1"), "id_1")
            .join(toks.withColumnRenamed("id", "id_2").withColumnRenamed("_t", "_t2"), "id_2")
        )

        def lcrun(t1: pd.Series, t2: pd.Series) -> pd.Series:
            out = np.zeros(len(t1), dtype=np.int64)
            for i in range(len(t1)):
                a = np.asarray(t1.iloc[i], dtype=np.int64)
                b = np.asarray(t2.iloc[i], dtype=np.int64)
                prev = np.zeros(len(b) + 1, dtype=np.int64)
                best = 0
                for x in range(1, len(a) + 1):
                    cur = np.zeros(len(b) + 1, dtype=np.int64)
                    eq = b == a[x - 1]
                    cur[1:][eq] = prev[:-1][eq] + 1
                    mx = cur.max()
                    if mx > best:
                        best = int(mx)
                    prev = cur
                out[i] = best
            return pd.Series(out)

        udf = F.pandas_udf(lcrun, LongType())
        return (
            joined.withColumn("common_span", udf("_t1", "_t2"))
            .filter(F.col("common_span") >= min_span)
            .select("id_1", "id_2", "common_span")
        )
