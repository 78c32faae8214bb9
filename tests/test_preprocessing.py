"""Preprocessing goldens (reference tests/test_preprocessing.py:15-296;
FIXTURES.md F6) + the byte-identity invariant for `clean`."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import preprocessing as prep


def _vals(spark, data, expr):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], "id long, raw string")
    return [r["out"] for r in df.select(expr.alias("out")).orderBy("id").collect()]


def test_clean_golden(spark):
    # docstring golden (cleaning.py:55-67)
    names = ["Mary-ann", "Bob :)", "Angel", "Bob (alias Billy)", None]
    got = _vals(spark, names, prep.clean(F.col("raw")))
    assert got == ["mary ann", "bob", "angel", "bob", None]


def test_clean_brackets_types(spark):
    data = ["a [x] b", "a (x) b", "a {x} b", "a [x (y) {z}] b"]
    got = _vals(spark, data, prep.clean(F.col("raw")))
    assert got == ["a b", "a b", "a b", "a b"]


def test_clean_lower_off(spark):
    got = _vals(spark, ["ABC dEf"], prep.clean(F.col("raw"), lowercase=False))
    assert got == ["ABC dEf"]


def test_clean_strip_accents_unicode(spark):
    got = _vals(
        spark, ["Ångström", "café"], prep.clean(F.col("raw"), strip_accents="unicode")
    )
    assert got == ["angstrom", "cafe"]


def test_clean_strip_accents_ascii(spark):
    got = _vals(spark, ["café"], prep.clean(F.col("raw"), strip_accents="ascii"))
    assert got == ["cafe"]


def test_clean_byte_identity_vs_pandas(spark):
    """north_rule invariant: byte-identical extracted text per url between
    the Spark chain and the reference-shaped pandas chain."""
    data = [
        "Mary-ann", "Bob :)", "Bob (alias Billy)", "  spaced   out  ",
        "UPPER_lower-MiXeD", "digits 123 ok!", "semi;colon,comma.dot",
        "tabs\tand\nnewlines", "(all bracketed)", "[]{}()", "a--b__c",
    ]
    spark_out = _vals(spark, data, prep.clean(F.col("raw")))
    pandas_out = prep.clean_pandas(pd.Series(data)).tolist()
    assert spark_out == pandas_out


def test_phonenumbers(spark):
    got = _vals(spark, ["+31 (0)20 123-4567", "06 12345678"],
                prep.phonenumbers(F.col("raw")))
    assert got == ["+310201234567", "0612345678"]


def test_value_occurence(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, None), (4, None)], "id long, raw string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", prep.value_occurence(F.col("raw")).alias("n")).collect()
    }
    assert got == {0: 2, 1: 2, 2: 1, 3: 2, 4: 2}


def test_phonetic_soundex(spark):
    got = _vals(spark, ["Robert", "Rupert", "Ashcraft", None],
                prep.phonetic(F.col("raw"), "soundex"))
    assert got[:2] == ["R163", "R163"]
    assert got[3] is None


def test_phonetic_nysiis(spark):
    got = _vals(spark, ["Smith", "Schmidt"], prep.phonetic(F.col("raw"), "nysiis"))
    assert got[0] == "SNAT"  # S, M->N, I->A, T, trailing H -> prev
    assert got[1] == "SNAD"  # SCH->SSS collapses, M->N, I->A, DT->D


def test_phonetic_metaphone(spark):
    got = _vals(spark, ["Thompson", "Tomson"], prep.phonetic(F.col("raw"), "metaphone"))
    assert all(isinstance(g, str) and g for g in got)


def test_phonetic_match_rating(spark):
    got = _vals(spark, ["Byrne", "Boern"], prep.phonetic(F.col("raw"), "match_rating"))
    assert got[0] == "BYRN"


def test_phonetic_unknown_method(spark):
    with pytest.raises(ValueError, match="not known"):
        prep.phonetic(F.col("raw"), "nope")


def test_clean_unicode_whitespace_byte_identity(spark):
    """Java's \\s is ASCII-only; the reference's Python/pandas whitespace
    handling is Unicode-aware. With replace_by_none disabled, a U+00A0
    must still collapse/strip identically on both sides (session-8
    review fix: (?U) flag on the whitespace regexes)."""
    vals = ["a  b", " lead", "trail ", "x  y"]
    pdf = pd.Series(vals)
    want = prep.clean_pandas(pdf, replace_by_none=None).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [
        r["c"]
        for r in df.select(
            prep.clean(F.col("s"), replace_by_none=None).alias("c")
        ).collect()
    ]
    assert got == want
