"""Compare-stage goldens, ported from the reference test strategy
(tests/test_compare.py patterns: exact values, NaN handling, thresholds,
date swaps, numeric decay kernels — SURVEY.md §5.3)."""

import math

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.comparing import Compare
from recordlinkage_spark import stringmetrics as sm


@pytest.fixture(scope="module")
def person_pairs(spark):
    """Aligned person frames + identity pairs for feature goldens."""
    left = spark.createDataFrame(
        [
            (0, "jones", 35.0, "2023-05-06"),
            (1, "smith", 40.0, "2023-06-15"),
            (2, None, None, None),
            (3, "brown", 22.0, "2023-09-03"),
            (4, "browne", 23.0, "2023-09-03"),
        ],
        "id long, name string, age double, dob string",
    ).withColumn("dob", F.to_date("dob"))
    right = spark.createDataFrame(
        [
            (0, "jones", 35.0, "2023-06-05"),
            (1, "smyth", 45.0, "2023-06-15"),
            (2, "x", 1.0, "2023-01-01"),
            (3, None, None, None),
            (4, "brown", 25.0, "2023-10-03"),
        ],
        "id long, name string, age double, dob string",
    ).withColumn("dob", F.to_date("dob"))
    pairs = spark.createDataFrame([(i, i) for i in range(5)], "id_1 long, id_2 long")
    return pairs, left, right


def _col(df, label):
    return {r["id_1"]: r[label] for r in df.collect()}


def test_exact(person_pairs):
    pairs, left, right = person_pairs
    out = Compare().exact("name", "name", label="e").compute(pairs, left, right)
    got = _col(out, "e")
    assert got == {0: 1.0, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}


def test_exact_custom_values(person_pairs):
    pairs, left, right = person_pairs
    out = Compare().exact(
        "name", "name", agree_value=7, disagree_value=-1, missing_value=9, label="e"
    ).compute(pairs, left, right)
    got = _col(out, "e")
    assert got == {0: 7.0, 1: -1.0, 2: 9.0, 3: 9.0, 4: -1.0}


def test_string_levenshtein_golden(person_pairs):
    pairs, left, right = person_pairs
    out = Compare().string("name", "name", "levenshtein", label="s").compute(
        pairs, left, right
    )
    got = _col(out, "s")
    # reference normalization 1 - dist/max(len) (string.py:49-63)
    assert got[0] == 1.0
    assert abs(got[1] - (1 - 1 / 5)) < 1e-9  # smith -> smyth: 1 substitution
    assert got[2] == 0.0 and got[3] == 0.0  # missing -> 0.0
    assert abs(got[4] - (1 - 1 / 6)) < 1e-9


def test_string_threshold_keeps_missing(person_pairs):
    pairs, left, right = person_pairs
    out = Compare().string(
        "name", "name", "levenshtein", threshold=0.9, missing_value=9.0, label="s"
    ).compute(pairs, left, right)
    got = _col(out, "s")
    # threshold cuts to {0,1} but missing stays missing (compare.py:154-160)
    # sims: 1.0, 0.8, missing, missing, 0.8333
    assert got == {0: 1.0, 1: 0.0, 2: 9.0, 3: 9.0, 4: 0.0}


@pytest.mark.parametrize("method", ["jaro", "jarowinkler", "damerau_levenshtein",
                                    "qgram", "cosine", "smith_waterman", "lcs"])
def test_string_methods_nan_and_range(person_pairs, method):
    # pattern of tests/test_compare.py:1295 test_string_algorithms_nan
    pairs, left, right = person_pairs
    out = Compare().string("name", "name", method, label="s").compute(
        pairs, left, right
    )
    got = _col(out, "s")
    assert got[2] == 0.0 and got[3] == 0.0
    for v in got.values():
        assert 0.0 <= v <= 1.0 + 1e-9
    assert got[0] == pytest.approx(1.0)  # identical strings


def test_numeric_kernels(spark):
    # pattern of tests/test_compare.py:813 — decay kernel golden values
    left = spark.createDataFrame([(0, 0.0), (1, 0.0), (2, 0.0), (3, None)],
                                 "id long, v double")
    right = spark.createDataFrame([(0, 0.0), (1, 1.0), (2, 2.0), (3, 1.0)],
                                  "id long, v double")
    pairs = spark.createDataFrame([(i, i) for i in range(4)], "id_1 long, id_2 long")
    c = (
        Compare()
        .numeric("v", "v", "step", offset=1.0, label="step")
        .numeric("v", "v", "linear", offset=0.0, scale=1.0, label="lin")
        .numeric("v", "v", "exp", offset=0.0, scale=1.0, label="exp")
        .numeric("v", "v", "gauss", offset=0.0, scale=1.0, label="gauss")
        .numeric("v", "v", "squared", offset=0.0, scale=1.0, label="sq")
    )
    out = c.compute(pairs, left, right)
    rows = {r["id_1"]: r for r in out.collect()}
    assert rows[0]["step"] == 1.0 and rows[1]["step"] == 1.0 and rows[2]["step"] == 0.0
    assert rows[1]["lin"] == pytest.approx(0.5)  # 1 - 1/(2*1)
    assert rows[2]["lin"] == pytest.approx(0.0)
    assert rows[1]["exp"] == pytest.approx(0.5)  # 2^-1
    assert rows[1]["gauss"] == pytest.approx(0.5)  # 2^-(1^2)
    assert rows[1]["sq"] == pytest.approx(0.5)  # 1 - 0.5*1^2
    assert rows[3]["lin"] == 0.0  # missing


def test_geo_haversine(spark):
    # Amsterdam (52.37, 4.90) to Paris (48.86, 2.35) ~= 430 km
    left = spark.createDataFrame([(0, 52.37, 4.90)], "id long, lat double, lng double")
    right = spark.createDataFrame([(0, 48.86, 2.35)], "id long, lat double, lng double")
    pairs = spark.createDataFrame([(0, 0)], "id_1 long, id_2 long")
    out = Compare().geo("lat", "lng", "lat", "lng", "linear", offset=0.0,
                        scale=400.0, label="g").compute(pairs, left, right)
    sim = out.collect()[0]["g"]
    # d ~ 430km, linear sim = 1 - 430/800 ~ 0.4625
    assert sim == pytest.approx(1 - 430.5 / 800.0, abs=0.01)


def test_date_swaps(person_pairs):
    # pattern of tests/test_compare.py:1001
    pairs, left, right = person_pairs
    out = Compare().date("dob", "dob", label="d").compute(pairs, left, right)
    got = _col(out, "d")
    assert got[0] == 0.5  # month/day swap 05-06 vs 06-05
    assert got[1] == 1.0  # equal
    assert got[2] == 0.0 and got[3] == 0.0  # missing
    assert got[4] == 0.5  # month 9 vs 10, same day -> default swap_months


def test_variable_and_frequency(spark):
    left = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, None)], "id long, k string"
    )
    pairs = spark.createDataFrame([(i, i) for i in range(4)], "id_1 long, id_2 long")
    out = (
        Compare()
        .frequency("k", side="left", label="freq")
        .compute(pairs, left, left)
    )
    got = _col(out, "freq")
    # counts over 4 pairs: a->2/4, b->1/4, null->missing_value 0.0
    assert got == {0: 0.5, 1: 0.5, 2: 0.25, 3: 0.0}


def test_custom_vectorized(spark):
    left = spark.createDataFrame([(0, 2.0), (1, 3.0)], "id long, v double")
    pairs = spark.createDataFrame([(0, 0), (1, 1)], "id_1 long, id_2 long")

    def both_sum(s_l, s_r, factor):
        return (s_l + s_r) * factor

    out = Compare().compare_vectorized(
        both_sum, "v", "v", 10.0, label="c"
    ).compute(pairs, left, left)
    assert _col(out, "c") == {0: 40.0, 1: 60.0}


# --- kernel-level goldens (no Spark) ---------------------------------------

def test_jaro_golden():
    assert sm.jaro("MARTHA", "MARHTA") == pytest.approx(0.9444444, abs=1e-6)
    assert sm.jaro("DIXON", "DICKSONX") == pytest.approx(0.7666666, abs=1e-6)
    assert sm.jaro("abc", "xyz") == 0.0


def test_jaro_winkler_golden():
    assert sm.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111, abs=1e-6)
    assert sm.jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-6)
    # below 0.7 jaro -> no winkler boost (jellyfish semantics)
    assert sm.jaro_winkler("abcxx", "axyzk") == sm.jaro("abcxx", "axyzk")


def test_levenshtein_golden():
    assert sm.levenshtein_distance("kitten", "sitting") == 3
    assert sm.levenshtein_distance("", "abc") == 3
    assert sm.levenshtein_distance("abc", "abc") == 0


def test_damerau_golden():
    assert sm.damerau_levenshtein_distance("ab", "ba") == 1
    assert sm.damerau_levenshtein_distance("ca", "abc") == 2  # unrestricted DL
    assert sm.damerau_levenshtein_distance("kitten", "sitting") == 3


def test_qgram_cosine_identical():
    assert sm.qgram_sim("jones", "jones") == pytest.approx(1.0)
    assert sm.cosine_sim("jones", "jones") == pytest.approx(1.0)
    assert sm.qgram_sim("abc", "xyz") == 0.0


def test_smith_waterman_norms():
    v = sm.smith_waterman_sim("abcde", "abcde")
    assert v == pytest.approx(1.0)
    assert sm.smith_waterman_sim("abc", "abcdef", norm="min") == pytest.approx(1.0)
    assert sm.smith_waterman_sim("abc", "abcdef", norm="max") == pytest.approx(0.5)


def test_lcs_goldens():
    assert sm.lcs_sim("abcde", "abcde") == pytest.approx(1.0)
    # 'dice': 2*lcs/(len1+len2)
    assert sm.lcs_sim("abcdxx", "abcdyy", norm="dice") == pytest.approx(2 * 4 / 12)
    assert sm.lcs_sim("ab", "cd") == 0.0


def test_variable_both_sides(spark):
    """side='both' emits the left AND right values (reference
    compare.py:449-460 tuple output) as <label>_a / <label>_b."""
    from recordlinkage_spark.comparing import Compare

    a = spark.createDataFrame([(1, 10.0), (2, None)], "id long, v double")
    b = spark.createDataFrame([(3, 30.0), (4, 40.0)], "id long, v double")
    pairs = spark.createDataFrame([(1, 3), (2, 4)], "id_1 long, id_2 long")
    out = (
        Compare()
        .variable("v", side="both", label="val")
        .compute(pairs, a, b)
        .collect()
    )
    got = {(r["id_1"], r["id_2"]): (r["val_a"], r["val_b"]) for r in out}
    assert got == {(1, 3): (10.0, 30.0), (2, 4): (0.0, 40.0)}  # null -> 0.0


def test_variable_both_normalized_in_constructor(spark):
    """r3: Variable(side='both') passed via Compare(features=[...]) must
    expand into _a/_b single-side features exactly like Compare.add
    (previously the constructor path silently emitted one column)."""
    from recordlinkage_spark.comparing import Compare, Variable

    via_ctor = Compare(features=[Variable("v", side="both", label="var")])
    via_add = Compare().add(Variable("v", side="both", label="var"))
    assert [f.label for f in via_ctor.features] == ["var_a", "var_b"]
    assert [f.label for f in via_ctor.features] == [f.label for f in via_add.features]
    assert all(f.side in ("left", "right") for f in via_ctor.features)


def test_variable_both_build_raises():
    from recordlinkage_spark.comparing import Variable

    with pytest.raises(NotImplementedError):
        Variable("v", side="both").build()


def test_compare_constructor_id_col_used(spark):
    """Compare(id_col='url') must key compute() on 'url' — the parameter
    was previously accepted and silently ignored (session-8 review fix)."""
    from recordlinkage_spark.comparing import Compare

    df = spark.createDataFrame(
        [("u1", "x"), ("u2", "x"), ("u3", "y")], "url string, val string"
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], "id_1 string, id_2 string"
    )
    out = {
        (r["id_1"], r["id_2"]): r["f"]
        for r in Compare(id_col="url")
        .exact("val", "val", label="f")
        .compute(pairs, df)
        .collect()
    }
    assert out == {("u1", "u2"): 1.0, ("u1", "u3"): 0.0}


def test_exact_agree_value_passthrough_string(spark):
    """agree_value='value' passes the raw value through in the column's
    own type — the double cast turned string agreements into NULLs
    (session-8 review fix)."""
    from recordlinkage_spark.comparing import Compare, Exact

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "zzz")], "id int, name string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_1 int, id_2 int")
    out = {
        (r["id_1"], r["id_2"]): r["f"]
        for r in Compare([Exact("name", "name", agree_value="value",
                                disagree_value="", missing_value="",
                                label="f")])
        .compute(pairs, df)
        .collect()
    }
    assert out == {(1, 2): "abc", (1, 3): ""}
