"""Text analysis column functions for the webtext pipeline.

Two layers:

1. JVM column functions (whole-stage codegen): tokenization, language-ID,
   quality scoring, token counting, exact fingerprints — cheap per-row
   expressions that stay JVM-side.
2. Vectorized numpy kernels (``*_np``) consumed by the pandas UDFs of the
   dedup passes (MinHash / SimHash / winnowing). Spark's higher-order array
   expressions (``transform``/``aggregate`` lambdas) are *interpreted*, not
   codegen'd — hashing 10M tokens through ``transform(xxhash64)`` measured
   ~60s on 32 cores, while the same work in one Arrow pass (pandas
   ``hash_array`` siphash + numpy combines) is <2s. So every hot pass
   hashes text Python-side, in one fused UDF per pass, and the JVM only
   ever sees the (tiny) signature outputs.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_U13, _U51 = np.uint64(13), np.uint64(51)


def _rot13_xor_np(acc: np.ndarray, h) -> np.ndarray:
    """uint64 rotate-left-13 then xor — the order-sensitive hash combine
    (numpy twin of :func:`_rotl_xor`)."""
    return ((acc << _U13) | (acc >> _U51)) ^ h


def flat_token_hashes_np(texts: pd.Series):
    """Tokenize + hash one Arrow batch of text.

    Returns ``(flat, lengths, isna)``: ``flat`` — uint64 siphash per token,
    all docs concatenated; ``lengths`` — tokens per doc (0 for null/empty);
    ``isna`` — bool mask of null texts. Tokenization is ``str.split()``
    (whitespace), hashing is ``pd.util.hash_array`` (vectorized cython
    siphash, deterministic fixed key) — no per-token Python objects beyond
    the split itself."""
    isna = texts.isna().to_numpy()
    vals = texts.to_numpy(dtype=object)
    tok_lists = [None if na else v.split() for v, na in zip(vals, isna)]
    lengths = np.fromiter(
        (0 if t is None else len(t) for t in tok_lists), dtype=np.int64,
        count=len(tok_lists),
    )
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.uint64), lengths, isna
    flat_tokens = np.fromiter(
        chain.from_iterable(t for t in tok_lists if t), dtype=object, count=total
    )
    flat = pd.util.hash_array(flat_tokens)
    return flat, lengths, isna


def gram_hashes_np(flat: np.ndarray, lengths: np.ndarray, n: int):
    """Word-n-gram hashes per doc over the flat token-hash array.

    Semantics match :func:`gram_hashes` (the JVM variant): a doc with
    ``len > n`` emits ``len-n+1`` position-order grams (NOT deduped — call
    :func:`distinct_per_doc_np` when set semantics are needed); a doc with
    ``0 <= len <= n`` emits ONE hash folding all tokens from 0 (empty doc
    -> [0]) so short docs still index. Null docs (length 0 *and* masked by
    the caller) are the caller's business — here len==0 emits [0].

    Returns ``(grams, counts)``: flat uint64 grams + per-doc gram counts.
    """
    ndocs = len(lengths)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    out_counts = np.where(lengths > n, lengths - n + 1, 1)
    out = np.empty(int(out_counts.sum()), dtype=np.uint64)
    out_ends = np.cumsum(out_counts)
    out_starts = out_ends - out_counts

    total = len(flat)
    m = total - (n - 1)
    if m > 0 and ndocs:
        g = flat[:m].copy()
        for j in range(1, n):
            g = _rot13_xor_np(g, flat[j : j + m])
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lengths)
        valid = doc_of[:m] == doc_of[n - 1 :]
        pos = np.nonzero(valid)[0]
        d = doc_of[pos]
        out[out_starts[d] + (pos - starts[d])] = g[pos]

    short = np.nonzero(lengths <= n)[0]
    for d in short:
        acc = np.uint64(0)
        for p in range(starts[d], ends[d]):
            acc = _rot13_xor_np(acc, flat[p])
        out[out_starts[d]] = acc
    return out, out_counts


def distinct_per_doc_np(vals: np.ndarray, counts: np.ndarray):
    """Per-doc distinct of a flat segmented array. Returns (vals, counts)
    with each doc's segment sorted + deduped (one lexsort, no per-doc
    loop)."""
    ndocs = len(counts)
    doc = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    order = np.lexsort((vals, doc))
    sv, sd = vals[order], doc[order]
    keep = np.ones(len(sv), dtype=bool)
    if len(sv) > 1:
        keep[1:] = (sv[1:] != sv[:-1]) | (sd[1:] != sd[:-1])
    new_counts = np.bincount(sd[keep], minlength=ndocs)
    return sv[keep], new_counts.astype(np.int64)


def segments_to_series(vals: np.ndarray, counts: np.ndarray, isna: np.ndarray) -> pd.Series:
    """Pack a flat segmented int64-viewable array back into a Series of
    per-doc arrays (None where isna)."""
    bounds = np.cumsum(counts)[:-1]
    segs = np.split(vals.view(np.int64), bounds)
    return pd.Series(
        [None if na else seg for seg, na in zip(segs, isna)], dtype=object
    )


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_shingles(tok_col: Column, n: int) -> Column:
    """Distinct word n-grams as array<string>; a doc shorter than n tokens
    contributes its whole token sequence as one shingle (so short docs
    still index). Pure JVM: transform over sequence."""
    joined = F.array_join(tok_col, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tok_col) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
    )
    return F.when(F.size(tok_col) <= n, F.array_distinct(F.array(joined))).otherwise(
        F.array_distinct(grams)
    )


def char_shingles(col: Column, n: int) -> Column:
    """Distinct char n-grams (for short fields like urls)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(col) - n, F.lit(0))),
        lambda i: F.substring(col, i + 1, n),
    )
    return F.array_distinct(grams)


def shingle_hashes(shingle_col: Column) -> Column:
    """xxhash64 each shingle JVM-side -> array<bigint>; the Python passes
    (MinHash/SimHash) consume hashes, never strings."""
    return F.transform(shingle_col, lambda s: F.xxhash64(s))


def _rotl_xor(acc: Column, h: Column) -> Column:
    """Order-sensitive hash combine using only bit ops (rotl-13 then xor) —
    ANSI-safe: long multiply/add would throw on overflow under Spark 4's
    default ANSI mode, bit shifts cannot."""
    rot = F.shiftleft(acc, 13).bitwiseOR(F.shiftrightunsigned(acc, 51))
    return rot.bitwiseXOR(h)


def token_hashes(tok_col: Column) -> Column:
    """xxhash64 per token -> array<bigint>."""
    return F.transform(tok_col, lambda t: F.xxhash64(t))


def gram_hashes(th_col: Column, n_tokens: Column, n: int) -> Column:
    """Distinct word-n-gram hashes from an ALREADY-BOUND token-hash array
    column: combine n consecutive token hashes with rotate-xor — pure long
    bit ops in codegen, no n-gram strings.

    IMPORTANT: ``th_col``/``n_tokens`` must be real columns (attributes),
    not inline expressions — ``element_at`` references the array n times
    per gram position and Catalyst re-inlines non-attribute expressions at
    every use site (an O(tokens^2) blowup measured at 8x wall time).
    """

    def combine(i):
        acc = F.element_at(th_col, i + 1)
        for j in range(1, n):
            acc = _rotl_xor(acc, F.element_at(th_col, i + 1 + j))
        return acc

    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tokens - n, F.lit(0))), combine
    )
    # short doc -> one shingle combining all tokens
    whole = F.aggregate(th_col, F.lit(0).cast("long"), _rotl_xor)
    return F.when(n_tokens <= n, F.array(whole)).otherwise(F.array_distinct(grams))


def with_word_shingle_hashes(df, text_col: str, n: int, out: str = "_sh"):
    """df + ``out`` = distinct word-n-gram hash array. Binds the token and
    token-hash arrays as real columns first (see gram_hashes)."""
    df = df.withColumn("_toks__", tokens(F.col(text_col)))
    df = df.withColumn("_th__", token_hashes(F.col("_toks__")))
    df = df.withColumn(
        out, gram_hashes(F.col("_th__"), F.size(F.col("_toks__")), n)
    )
    return df.drop("_toks__", "_th__")


def word_shingle_hashes(tok_col: Column, n: int) -> Column:
    """Single-expression variant for small/test data. On hot paths use
    :func:`with_word_shingle_hashes` (bound columns, no re-inlining)."""
    th = token_hashes(tok_col)
    return gram_hashes(th, F.size(tok_col), n)


# --- language ID (n-gram/stopword heuristic) -------------------------------

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "nl": ["de", "het", "een", "en", "van", "niet", "met", "zijn"],
}


def lang_scores(tok_col: Column) -> dict[str, Column]:
    """Per-language score = |distinct tokens ∩ marker set|."""
    return {
        lang: F.size(F.array_intersect(F.array_distinct(tok_col),
                                       F.array(*[F.lit(w) for w in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(tok_col: Column) -> Column:
    """argmax language by marker hits, 'und' (undetermined) when all zero.
    Deterministic tiebreak: priority order en > de > fr > nl. The logic is
    a flat greatest+CASE so a SQL oracle can replicate it verbatim."""
    scores = lang_scores(tok_col)
    g = F.greatest(*scores.values())
    expr = F.when(g == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = priority
        expr = expr.when(scores[lang] == g, F.lit(lang))
    return expr.otherwise(F.lit("und"))


# --- quality scoring --------------------------------------------------------

STOPWORDS = LANG_MARKERS["en"]


def quality_features(text_col: Column, tok_col: Column) -> dict[str, Column]:
    n_chars = F.length(text_col)
    n_tokens = F.size(tok_col)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0,
            (n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))).cast("double") / n_chars,
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0,
            F.size(
                F.filter(tok_col, lambda t: t.isin(STOPWORDS))
            ).cast("double") / n_tokens,
        ).otherwise(F.lit(0.0)),
    }


def quality_score(text_col: Column, tok_col: Column) -> Column:
    """Composite quality in [0,1]: penalize too-short docs, high punctuation,
    zero stopwords (boilerplate/gibberish signals). Deliberately simple and
    SQL-expressible so a DuckDB oracle can replicate it bit-for-bit."""
    f = quality_features(text_col, tok_col)
    len_score = F.least(f["n_tokens"].cast("double") / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(f["punct_ratio"] * 4.0, F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


# --- token counting ---------------------------------------------------------

def whitespace_token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """Approximate subword count with the classic pre-tokenizer regex:
    word pieces + standalone punctuation (a stand-in for a real BPE count;
    deterministic and SQL-portable)."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def doc_fingerprint(text_col: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text.
    md5 is portable (same value in Spark and DuckDB) so correctness oracles
    can verify it; at scale swap for xxhash64 (cheaper, JVM)."""
    norm = F.lower(F.regexp_replace(F.trim(text_col), r"\s+", " "))
    return F.md5(norm)
