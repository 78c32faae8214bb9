"""Long-span exact-substring dedup via winnowed rolling-hash fingerprints.

Not in the reference (SURVEY.md §2.2 "new") — handles the north rule's
"exact long-span duplicates" clause. A per-partition suffix array cannot
see cross-partition duplicates; the scalable equivalent is document
fingerprinting (Schleimer/Wilkerson/Aiken 2003, "winnowing"):

  text -> tokenize + siphash per token (vectorized, Python-side: see
  textfns module docstring) -> rolling polynomial hash of every
  ``span_tokens``-token window -> winnowing: keep the min hash of each
  ``winnow_window`` consecutive windows -> explode -> equi-join on the
  fingerprint.

Guarantee: any exact common token span of length >= span_tokens +
winnow_window - 1 shares at least one selected fingerprint, so with the
defaults (32, 19) every shared 50-token span is caught — deterministically,
not probabilistically. Optional exact verification computes the true
longest common token run per candidate pair.

The whole kernel is segment-vectorized over the Arrow batch: rolling
hashes, the sliding-window min, and the per-doc distinct each run as ONE
numpy pass over the flat concatenated token stream with doc-boundary
masking — no per-doc Python loop on the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from recordlinkage_spark import textfns

_P = np.uint64(1099511628211)  # FNV-ish odd multiplier for the rolling hash


def winnow_fingerprints_np(flat: np.ndarray, lengths: np.ndarray,
                           span: int, window: int):
    """Winnowed fingerprints per doc over a flat segmented token-hash array.

    Returns ``(vals, counts)``: flat uint64 fingerprints (distinct + sorted
    within each doc) and per-doc counts (0 for docs shorter than ``span``).

    Rolling hash: H_i = P^(i+span-1) * (T_{i+span} - T_i) with
    T_k = sum_{j<k} h_j * P^(-j), all uint64-wraparound (P odd => P
    invertible mod 2^64). H_i depends only on the window's CONTENT —
    global-position exponents cancel — so computing it over the whole
    flat batch and masking windows that cross doc boundaries is exact.
    """
    np.seterr(over="ignore")
    ndocs = len(lengths)
    total = len(flat)
    # windows per doc / selected fingerprints per doc
    m = np.maximum(lengths - span + 1, 0)
    sel_counts = np.where(m > window, m - window + 1, (m > 0).astype(np.int64))
    M = total - span + 1
    if total == 0 or M <= 0 or not m.any():
        return np.empty(0, np.uint64), np.zeros(ndocs, dtype=np.int64)

    # --- global rolling hash -------------------------------------------
    p_inv = np.uint64(pow(int(_P), -1, 2**64))
    invp = np.ones(total, dtype=np.uint64)
    invp[1:] = p_inv
    np.multiply.accumulate(invp, out=invp)               # P^(-i)
    t = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(flat * invp, out=t[1:])                    # T_k (wraps)
    pw = np.empty(M, dtype=np.uint64)
    pw[0] = _P
    for _ in range(span - 2):                            # P^(span-1)
        pw[0] = pw[0] * _P
    pw[1:] = _P
    np.multiply.accumulate(pw, out=pw)                   # P^(i+span-1)
    roll = pw * (t[span:] - t[:M])

    # keep only windows fully inside one doc
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lengths)
    flat_roll = roll[doc_of[:M] == doc_of[span - 1:]]    # segmented by doc, counts m

    # --- winnowing: per-doc sliding min of width `window` ----------------
    roll_ends = np.cumsum(m)
    roll_starts = roll_ends - m
    out = np.empty(int(sel_counts.sum()), dtype=np.uint64)
    out_ends = np.cumsum(sel_counts)
    out_starts = out_ends - sel_counts
    W = len(flat_roll) - window + 1
    if W > 0:
        sw_min = np.lib.stride_tricks.sliding_window_view(
            flat_roll, window
        ).min(axis=1)
        roll_doc = np.repeat(np.arange(ndocs, dtype=np.int64), m)
        pos = np.nonzero(roll_doc[:W] == roll_doc[window - 1:])[0]
        d = roll_doc[pos]
        out[out_starts[d] + (pos - roll_starts[d])] = sw_min[pos]
    # docs with 1 <= m <= window: one fingerprint = min of the segment
    for d in np.nonzero((m > 0) & (m <= window))[0]:
        out[out_starts[d]] = flat_roll[roll_starts[d]:roll_ends[d]].min()

    return textfns.distinct_per_doc_np(out, sel_counts)


def make_fingerprint_udf(span: int, window: int):
    """pandas UDF: raw text -> array<bigint> winnowed fingerprints
    (distinct). Null text or docs shorter than ``span`` tokens -> null."""

    def batch(texts: pd.Series) -> pd.Series:
        flat, lengths, isna = textfns.flat_token_hashes_np(texts)
        vals, counts = winnow_fingerprints_np(flat, lengths, span, window)
        res = textfns.segments_to_series(vals, counts, isna)
        # too-short docs -> null (explode drops empties anyway; null keeps
        # the historical contract)
        res[(counts == 0) & ~isna] = None
        return res

    # see minhash.make_band_udf: prevents duplicate evaluation on pushdown
    return F.pandas_udf(batch, ArrayType(LongType())).asNondeterministic()


def make_token_hash_udf():
    """pandas UDF: raw text -> array<bigint> per-token hashes (ordered,
    non-distinct) — input for exact longest-common-run verification."""

    def batch(texts: pd.Series) -> pd.Series:
        flat, lengths, isna = textfns.flat_token_hashes_np(texts)
        return textfns.segments_to_series(flat, lengths, isna)

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
        udf = make_fingerprint_udf(self.span_tokens, self.winnow_window)
        fp = df.select(
            F.col(id_col).alias("id"), udf(F.col(text_col)).alias("_fps")
        ).filter(F.col("_fps").isNotNull())
        return fp.select("id", F.explode("_fps").alias("fp"))

    def candidate_pairs(self, df: DataFrame, id_col: str, text_col: str,
                        dropped_acc=None) -> DataFrame:
        """One shuffle on the fingerprint key + sorted Arrow pair expansion
        (shared machinery with the LSH pass — see minhash.bucket_pairs);
        oversize fingerprint buckets (ubiquitous boilerplate spans) are
        dropped streaming, bounding both memory and pair fan-out.
        ``dropped_acc``: optional accumulator counting dropped buckets."""
        from recordlinkage_spark.minhash import bucket_pairs

        fps = self.fingerprints(df, id_col, text_col)
        id_type = df.schema[id_col].dataType.simpleString()
        return bucket_pairs(fps, ["fp"], self.max_bucket_size, id_type,
                            dropped_acc=dropped_acc)

    def verified_pairs(self, df: DataFrame, id_col: str, text_col: str,
                       min_span: int | None = None) -> DataFrame:
        """Candidates + exact longest-common-token-run verification
        (numpy DP per pair in one Arrow batch)."""
        min_span = min_span or self.span_tokens
        cands = self.candidate_pairs(df, id_col, text_col)
        # persist: avoid re-tokenizing each doc once per probed pair
        tok_udf = make_token_hash_udf()
        toks = df.select(
            F.col(id_col).alias("id"), tok_udf(F.col(text_col)).alias("_t")
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
