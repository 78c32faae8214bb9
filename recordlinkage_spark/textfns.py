"""Text analysis column functions for the webtext pipeline.

All JVM-side (whole-stage codegen) unless noted: tokenization, shingling,
language-ID heuristic, quality scoring, token counting, fingerprinting.
These are the building blocks of the dedup passes and the training-data
pipeline operators (dedup / quality filtering at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
