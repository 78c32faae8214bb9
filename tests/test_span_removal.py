"""End-to-end tests for suffix.remove_duplicate_spans (ExactSubstr-style
span removal, Lee et al. 2022 semantics: keep one occurrence corpus-wide,
delete the rest from the text)."""

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.suffix import (
    FingerprintSubstring,
    remove_duplicate_spans,
)

SPAN, WINDOW = 8, 5          # guarantee threshold: shared run >= 12 tokens
BLOCK = " ".join(f"dup{j}" for j in range(20))  # 20-token planted block


def corpus(spark, with_block=("a", "b", "c")):
    """5 docs of globally-unique filler words; docs in ``with_block`` carry
    the identical 20-token BLOCK in the middle."""
    rows = []
    for i, did in enumerate("abcde"):
        filler1 = " ".join(f"d{did}x{j}" for j in range(15))
        filler2 = " ".join(f"d{did}y{j}" for j in range(15))
        text = (f"{filler1} {BLOCK} {filler2}" if did in with_block
                else f"{filler1} {filler2}")
        rows.append((did, text))
    rows.append(("nul", None))
    rows.append(("short", "just three tokens"))
    return spark.createDataFrame(rows, "doc_id string, text string")


def run(spark, df, **kw):
    out = remove_duplicate_spans(
        df, "doc_id", "text", span_tokens=SPAN, winnow_window=WINDOW, **kw
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_keep_one_breaks_all_but_first(spark):
    df = corpus(spark)
    by_id = run(spark, df)
    assert set(by_id) == {"a", "b", "c", "d", "e", "nul", "short"}
    # keeper = globally-first occurrence -> doc 'a' keeps the block intact
    assert BLOCK in by_id["a"]["text"]
    assert by_id["a"]["cut_tokens"] == 0
    for did in ("b", "c"):
        assert BLOCK not in by_id[did]["text"]
        assert by_id[did]["cut_spans"] >= 1
        # cuts stay inside the block: unique filler words all survive
        for j in range(15):
            assert f"d{did}x{j}" in by_id[did]["text"]
            assert f"d{did}y{j}" in by_id[did]["text"]
    # unrelated / null / short docs byte-identical
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    for did in ("d", "e", "nul", "short"):
        assert by_id[did]["text"] == orig[did]
        assert by_id[did]["cut_tokens"] == 0


def test_output_has_no_remaining_cross_doc_span(spark):
    """After removal the verified-pairs pass finds nothing at the winnowing
    guarantee threshold (the property the operator exists for)."""
    df = corpus(spark)
    out = remove_duplicate_spans(
        df, "doc_id", "text", span_tokens=SPAN, winnow_window=WINDOW
    )
    pairs = FingerprintSubstring(SPAN, WINDOW).verified_pairs(
        out.filter(F.col("text").isNotNull()), "doc_id", "text",
        min_span=SPAN + WINDOW - 1,
    )
    assert pairs.count() == 0


def test_keep_one_false_removes_every_copy(spark):
    by_id = run(spark, corpus(spark), keep_one=False)
    for did in ("a", "b", "c"):
        assert BLOCK not in by_id[did]["text"]
        assert by_id[did]["cut_spans"] >= 1


def test_deterministic(spark):
    df = corpus(spark)
    a = run(spark, df)
    b = run(spark, df)
    assert {k: (v["text"], v["cut_spans"], v["cut_tokens"])
            for k, v in a.items()} == {
        k: (v["text"], v["cut_spans"], v["cut_tokens"]) for k, v in b.items()
    }


def test_within_doc_repetition_is_cut(spark):
    """A doc repeating its own 20-token block twice loses the second copy
    (occurrence granularity, not doc granularity)."""
    filler = " ".join(f"f{j}" for j in range(10))
    df = spark.createDataFrame(
        [("solo", f"{BLOCK} {filler} {BLOCK}")], "doc_id string, text string"
    )
    by_id = run(spark, df)
    t = by_id["solo"]["text"]
    assert t.count(BLOCK) == 1
    assert by_id["solo"]["cut_spans"] >= 1
    for j in range(10):
        assert f"f{j}" in t


def test_schema_and_columns(spark):
    out = remove_duplicate_spans(
        corpus(spark), "doc_id", "text",
        span_tokens=SPAN, winnow_window=WINDOW,
    )
    assert out.columns == ["doc_id", "text", "cut_spans", "cut_tokens"]
    assert dict(out.dtypes)["cut_spans"] == "int"
    assert dict(out.dtypes)["cut_tokens"] == "bigint"


def test_plan_computes_winnowing_once(spark):
    """Scale regressions (session-6 review): (a) both join branches must
    read the checkpointed cut lists, not recompute the winnowing UDF
    subtree per branch — unmaterialized, the plan held TWO full corpus
    UDF passes; (b) occurrence counting must be a map-side-combining
    aggregate, never a Window over partitionBy(fp) (a hot boilerplate
    fingerprint funnels every occurrence into one window task)."""
    df = corpus(spark)
    out = remove_duplicate_spans(
        df, "doc_id", "text", span_tokens=SPAN, winnow_window=WINDOW
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the checkpointed cut-list table (schema [_cut_id, _cuts]) is read by
    # both join branches; the corpus itself is also an ExistingRDD here
    # (createDataFrame), so match the cut-list scan by its schema
    assert plan.count("Scan ExistingRDD[_cut_id") == 2
    assert plan.count("ArrowEvalPython") == 1    # surgery UDF only
    assert "Window" not in plan


def test_boilerplate_fp_cap(spark):
    """max_fp_occurrences: a span shared by MANY docs is boilerplate and is
    NOT cut; the same corpus with the cap lifted cuts it keep-one."""
    rows = [
        (f"d{i}", f"u{i}a u{i}b {BLOCK} u{i}c u{i}d") for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    capped = remove_duplicate_spans(
        df, "doc_id", "text", span_tokens=SPAN, winnow_window=WINDOW,
        max_fp_occurrences=5,
    )
    assert capped.filter("cut_spans > 0").count() == 0
    uncapped = remove_duplicate_spans(
        df, "doc_id", "text", span_tokens=SPAN, winnow_window=WINDOW,
        max_fp_occurrences=None,
    )
    kept = [r for r in uncapped.collect() if BLOCK in (r["text"] or "")]
    assert len(kept) == 1


def test_pipeline_cleaned_stage(spark, tmp_path):
    """remove_spans=True adds a checkpointed 'cleaned' stage whose text has
    the planted block cut everywhere but the keeper, and resume skips it."""
    from recordlinkage_spark.config import EngineConfig
    from recordlinkage_spark.pipeline import DedupPipeline

    df = corpus(spark).filter(F.col("text").isNotNull())
    cfg = EngineConfig(num_perm=64, lsh_bands=16, lsh_rows=4,
                       shingle_size=2, span_tokens=SPAN,
                       winnow_window=WINDOW)
    work = str(tmp_path / "wd")
    p1 = DedupPipeline(cfg, work_dir=work, jaccard_threshold=0.5,
                       remove_spans=True)
    out = p1.run(df, id_col="doc_id", text_col="text")
    assert "cleaned" in out
    cleaned = {r["doc_id"]: r for r in out["cleaned"].collect()}
    survivors = [d for d in ("a", "b", "c") if BLOCK in cleaned[d]["text"]]
    assert len(survivors) == 1
    assert "cleaned" in [m["stage"] for m in p1.metrics]
    # resume: the stage is read back from the manifest, not re-run
    p2 = DedupPipeline(cfg, work_dir=work, jaccard_threshold=0.5,
                       remove_spans=True)
    out2 = p2.run(df, id_col="doc_id", text_col="text")
    assert p2.metrics == []
    assert out2["cleaned"].filter("cut_spans > 0").count() == \
        out["cleaned"].filter("cut_spans > 0").count()
