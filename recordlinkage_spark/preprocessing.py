"""Preprocessing scalar functions.

Reference: recordlinkage/preprocessing/cleaning.py + encoding.py. ``clean``
is the highest-fidelity port in the engine: the north rule pins
byte-identical extracted text per url, so the regex *order* of
cleaning.py:118-133 is preserved exactly:

    lower → [strip accents] → remove bracketed content → remove
    [^ \\-\\_A-Za-z0-9]+ → [\\-\\_]→' ' → collapse '\\s\\s+' → strip

Everything except accent-stripping runs JVM-side (regexp_replace chains in
whole-stage codegen); accent-stripping is a pandas UDF over unicodedata,
matching sklearn's strip_accents_unicode/ascii used by the reference.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from recordlinkage_spark import stringmetrics as sm

BRACKETS_RE = r"(\[.*?\]|\(.*?\)|\{.*?\})"
DEFAULT_REPLACE_BY_NONE = r"[^ \-\_A-Za-z0-9]+"
DEFAULT_REPLACE_BY_WHITESPACE = r"[\-\_]"


def _strip_accents_udf(kind: str) -> Column:
    def batch(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            norm = unicodedata.normalize("NFKD", x)
            if kind == "ascii":
                return norm.encode("ascii", "ignore").decode("ascii")
            return "".join(c for c in norm if not unicodedata.combining(c))

        return s.map(one)

    return F.pandas_udf(batch, StringType())


def clean(
    col: Column,
    lowercase: bool = True,
    replace_by_none: str | None = DEFAULT_REPLACE_BY_NONE,
    replace_by_whitespace: str | None = DEFAULT_REPLACE_BY_WHITESPACE,
    strip_accents: str | None = None,
    remove_brackets: bool = True,
) -> Column:
    """Column-expression port of cleaning.py:7-135 (same regex order)."""
    out = col
    if lowercase:
        out = F.lower(out)
    if strip_accents:
        if strip_accents not in ("ascii", "unicode"):
            raise ValueError(f"Invalid value for 'strip_accents': {strip_accents}")
        out = _strip_accents_udf(strip_accents)(out)
    if remove_brackets:
        out = F.regexp_replace(out, BRACKETS_RE, "")
    if replace_by_none:
        out = F.regexp_replace(out, replace_by_none, "")
    if replace_by_whitespace:
        out = F.regexp_replace(out, replace_by_whitespace, " ")
    # (?U) = Java UNICODE_CHARACTER_CLASS: Java's \s is ASCII-only while
    # the reference runs Python/pandas regexes whose \s (and
    # lstrip/rstrip) are Unicode-aware — without the flag, U+00A0-style
    # whitespace survives the collapse/strip here but not in
    # clean_pandas, breaking the byte-identity invariant whenever
    # replace_by_none doesn't already remove it (session-8 review fix)
    out = F.regexp_replace(out, r"(?U)\s\s+", " ")
    # pandas lstrip/rstrip strips all whitespace, not just spaces
    out = F.regexp_replace(
        F.regexp_replace(out, r"(?U)^\s+", ""), r"(?U)\s+$", ""
    )
    return out


def clean_pandas(
    s: pd.Series,
    lowercase: bool = True,
    replace_by_none: str | None = DEFAULT_REPLACE_BY_NONE,
    replace_by_whitespace: str | None = DEFAULT_REPLACE_BY_WHITESPACE,
    remove_brackets: bool = True,
) -> pd.Series:
    """Reference-shaped pandas twin of :func:`clean` used by the
    byte-identity invariant test (BASELINE.md per-row invariant)."""
    if lowercase:
        s = s.str.lower()
    if remove_brackets:
        s = s.str.replace(BRACKETS_RE, "", regex=True)
    if replace_by_none:
        s = s.str.replace(replace_by_none, "", regex=True)
    if replace_by_whitespace:
        s = s.str.replace(replace_by_whitespace, " ", regex=True)
    s = s.str.replace(r"\s\s+", " ", regex=True)
    return s.str.lstrip().str.rstrip()


def phonenumbers(col: Column) -> Column:
    """Strip all but [0-9+] (cleaning.py:138-156)."""
    return F.regexp_replace(col, r"[^0-9+]+", "")


def value_occurence(col: Column) -> Column:
    """Per-row count of the row's value in the column; nulls group together
    (cleaning.py:159-176). Window partitioned by the value — distributed."""
    grouped = F.coalesce(col.cast("string"), F.lit("NAN"))
    return F.count("*").over(Window.partitionBy(grouped))


_PHONETIC = {
    "soundex": sm.soundex,
    "nysiis": sm.nysiis,
    "nyssis": sm.nysiis,
    "metaphone": sm.metaphone,
    "match_rating": sm.match_rating_codex,
    "match rating": sm.match_rating_codex,
    "matchrating": sm.match_rating_codex,
    "match_rating_codex": sm.match_rating_codex,
    "matchratingcodex": sm.match_rating_codex,
}


def phonetic(col: Column, method: str, concat: bool = True) -> Column:
    """Phonetic encoding (encoding.py:39-93): optional whitespace/-/_ removal,
    uppercase, then the code. soundex uses Spark's JVM built-in."""
    if method not in _PHONETIC:
        raise ValueError(f"The algorithm '{method}' is not known.")
    out = col
    if concat:
        out = F.regexp_replace(out, r"[\-\_\s]", "")
    out = F.upper(out)
    if method == "soundex":
        return F.soundex(out)
    kernel = _PHONETIC[method]

    def batch(s: pd.Series) -> pd.Series:
        return s.map(lambda x: kernel(x) if x is not None else None)

    return F.pandas_udf(batch, StringType())(out)
