"""North-rule per-row invariant: byte-identical extracted text per url.

The input_hint table carries html binary; ``textfns.extract_text`` must
recover the page text deterministically, JVM-only. These tests pin the
renderer<->extractor contract byte-for-byte on the synthetic corpus (every
url), on adversarial entity/nesting cases, and prove the Spark renderer
(render_html_expr) and the python renderer (datagen.render_html) agree.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import datagen, textfns


def test_corpus_roundtrip_byte_identical_per_url(spark):
    """Every url in the synthetic corpus: extract_text(html) == text."""
    corpus, _ = datagen.webtext_corpus(spark, n_docs=300, seed=11)
    bad = (
        corpus.select(
            "url",
            "text",
            textfns.extract_text(F.col("html")).alias("extracted"),
        )
        .where(~(F.col("extracted") == F.col("text")))
        .limit(5)
        .collect()
    )
    assert bad == [], f"extraction not byte-identical: {bad}"


def test_distributed_corpus_roundtrip(spark):
    corpus, _ = datagen.webtext_corpus_distributed(spark, n_docs=500, seed=7)
    n_bad = (
        corpus.select(
            textfns.extract_text(F.col("html")).alias("e"), "text"
        )
        .where(~(F.col("e") == F.col("text")))
        .count()
    )
    assert n_bad == 0


ADVERSARIAL = [
    # literal entities in the text must survive escape->unescape
    "price is 3 &lt; 5 &amp; 7 &gt; 2",
    "a literal &amp;lt; stays &amp;lt;",
    "quotes \"double\" and 'single' and &quot;escaped&quot;",
    "ampersand chains && &&lt; &amp;&amp;",
    "unicode café straße 中文 and nbsp inside",
    "tag-ish text like <notatag> is content",  # renderer escapes it
    "x",  # single token
    "",  # empty text
]


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_adversarial_roundtrip_python_renderer(spark, text):
    html = datagen.render_html(text, "https://ex.com/?q=a&b=\"c\"")
    df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
    out = df.select(textfns.extract_text(F.col("html")).alias("e")).first()["e"]
    assert out == text


def test_spark_renderer_matches_python_renderer(spark):
    """render_html_expr at para split = whole text must emit the same bytes
    as datagen.render_html with one paragraph, and both must round-trip."""
    texts = [t for t in ADVERSARIAL if t]
    pdf = pd.DataFrame({"text": texts, "url": ["https://e.x/%d?a=&b=<" % i for i in range(len(texts))]})
    df = spark.createDataFrame(pdf)
    rows = df.select(
        "text",
        "url",
        textfns.render_html_expr(F.col("text"), F.col("url")).alias("h_spark"),
        textfns.extract_text(
            textfns.render_html_expr(F.col("text"), F.col("url"))
        ).alias("e"),
    ).collect()
    for r in rows:
        py = datagen.render_html(r["text"], r["url"], para_words=10**9)
        assert bytes(r["h_spark"]) == py
        assert r["e"] == r["text"]


def test_script_style_comment_stripped(spark):
    """Hostile markup: uppercase tags, attributes with '>', nested fake
    closers inside script strings, comments containing tags."""
    html = (
        b"<HTML><HEAD><SCRIPT type=\"text/js\">var a = \"</p>\"; if (x<y) {}"
        b"</SCRIPT ><Style media=\"a>b\">body { x: 1 }</style></HEAD>"
        b"<!-- <p>ghost</p> --><body><P Class='z'>keep  me</P></body></HTML>"
    )
    df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
    out = df.select(textfns.extract_text(F.col("html")).alias("e")).first()["e"]
    assert out == "keep me"


def test_null_html_is_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"html": pd.Series([None], dtype=object)})
    )
    out = df.select(textfns.extract_text(F.col("html")).alias("e")).first()["e"]
    assert out is None


def test_extract_text_plan_is_jvm_only(spark):
    """No Python in the path: the plan must stay in whole-stage codegen /
    project — no BatchEvalPython, ArrowEvalPython, or MapInPandas nodes."""
    corpus, _ = datagen.webtext_corpus(spark, n_docs=50, seed=3)
    plan = (
        corpus.select(textfns.extract_text(F.col("html")).alias("e"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
