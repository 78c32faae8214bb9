"""corpus_stats and the self-trained unigram-LM quality scorer
(textfns.corpus_stats / textfns.unigram_logprob)."""

import math

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.textfns import corpus_stats, unigram_logprob


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat sat", "en"),          # exact dup of 1
        (3, "the dog sat on the mat", "en"),
        (4, "der hund", "de"),
        (5, "", "en"),                      # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_corpus_stats_exact(spark, corpus):
    row = corpus_stats(corpus, "text", lang_col="lang").collect()[0]
    assert row["n_docs"] == 5
    assert row["n_distinct_texts"] == 4
    assert row["exact_dup_rate"] == pytest.approx(1 - 4 / 5, abs=1e-6)
    texts = ["the cat sat", "the cat sat", "the dog sat on the mat", "der hund", ""]
    assert row["total_chars"] == sum(len(t) for t in texts)
    assert row["mean_chars"] == pytest.approx(
        sum(len(t) for t in texts) / 5, abs=1e-6
    )
    assert row["total_tokens"] == sum(len(t.split()) for t in texts)
    assert row["n_langs"] == 2


def test_unigram_logprob_matches_closed_form(spark, corpus):
    k = 0.5
    out = {
        r["doc_id"]: r
        for r in unigram_logprob(
            corpus, "doc_id", "text", vocab_size=100, add_k=k
        ).collect()
    }
    # closed-form model over the same corpus
    toks = []
    texts = {1: "the cat sat", 2: "the cat sat",
             3: "the dog sat on the mat", 4: "der hund", 5: ""}
    for t in texts.values():
        toks += t.lower().split()
    from collections import Counter

    c = Counter(toks)
    n, v = sum(c.values()), len(c)
    denom = n + k * (v + 1)

    def lp(tok):
        return math.log((c[tok] + k) / denom)

    for did, t in texts.items():
        words = t.lower().split()
        assert out[did]["n_tokens"] == len(words)
        if words:
            want = sum(lp(w) for w in words) / len(words)
            assert out[did]["mean_logprob"] == pytest.approx(want, abs=2e-6)
        else:
            assert out[did]["mean_logprob"] == 0.0
    # dup docs score identically; the rarer-vocab doc scores lower
    assert out[1]["mean_logprob"] == out[2]["mean_logprob"]
    assert out[4]["mean_logprob"] < out[1]["mean_logprob"]


def test_unigram_logprob_oov_slot(spark, corpus):
    # vocab_size=2 keeps only the two most frequent tokens ('the' x4,
    # 'sat' x3); everything else shares the OOV probability
    k = 0.5
    out = {
        r["doc_id"]: r["mean_logprob"]
        for r in unigram_logprob(
            corpus, "doc_id", "text", vocab_size=2, add_k=k
        ).collect()
    }
    from collections import Counter

    c = Counter(
        w for t in ["the cat sat", "the cat sat",
                    "the dog sat on the mat", "der hund"]
        for w in t.split()
    )
    n, v = sum(c.values()), 2
    denom = n + k * (v + 1)
    oov = math.log(k / denom)

    def lp(tok):
        return math.log((c[tok] + k) / denom) if tok in ("the", "sat") else oov

    words = "the cat sat".split()
    want = sum(lp(w) for w in words) / len(words)
    assert out[1] == pytest.approx(want, abs=2e-6)
    # an all-OOV doc scores exactly the OOV logprob
    assert out[4] == pytest.approx(oov, abs=2e-6)


def test_unigram_vocab_is_distributed_topk(spark, corpus):
    # The vocab fit must compile to a distributed top-K, never to a
    # row_number over an unpartitioned window (whose WindowExec funnels
    # the full distinct-token table — billions of rows on a web corpus —
    # through a single task). Regression guard for the plan shape.
    out = unigram_logprob(corpus, "doc_id", "text", vocab_size=65536)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
