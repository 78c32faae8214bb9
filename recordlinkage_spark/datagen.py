"""Deterministic synthetic data generators (seeded; no external data).

Two generators mirror the reference's test-fixture roles:

- ``webtext_corpus``: FIXTURES.md F1 — Common-Crawl-shaped table
  (url, warc_ts, html, text, lang) with planted duplicate clusters
  (exact / token-edit near-dups / long-span substring overlaps) plus a
  truth-pairs table, mirroring the roles of
  recordlinkage/datasets/generate.py:5-89 and the FEBRL truth-link
  derivation recordlinkage/datasets/febrl.py:30-49.

- ``binary_vectors``: FIXTURES.md F4 — the classifier statistical oracle
  (recordlinkage/datasets/generate.py:5-89): n pair vectors where matched
  pairs agree on column i with probability m[i] and non-matches with u[i].

Both build on the driver with numpy (test scale) and return Spark
DataFrames; a distributed variant (spark.range + seeded hash-derived
uniforms) is the scale path for benches > ~1M docs.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB = (
    "the quick brown fox jumps over lazy dog web page content crawl data "
    "spark query engine near duplicate detection cluster shingle signature "
    "band bucket join shuffle partition skew salt text token hash filter "
    "scan index compare classify match pair record link house street city "
    "news article report market price stock value world nation state local "
    "game team player score win loss season coach field sport music film "
    "show actor scene story book author title press media online site link"
).split()

LANGS = ["en", "de", "fr", "nl"]

BOILERPLATE = (
    "all rights reserved terms of service privacy policy cookie notice "
    "subscribe newsletter follow us on social media contact about careers "
    "copyright two thousand twenty four site map help center faq support "
    "login register search home news sports business entertainment weather"
).split()


def render_html(text: str, url: str, para_words: int = 30) -> bytes:
    """Deterministic Common-Crawl-flavored page renderer (python twin of
    textfns.render_html_expr). The payload is the ONLY visible text —
    boilerplate lives in attributes, a comment, script and style bodies
    (all of which textfns.extract_text strips) — so the north rule's
    per-url invariant holds byte-for-byte on whitespace-normalized text:
    ``extract_text(render_html(text, url)) == text``
    (tests/test_extract_text.py). Text is entity-escaped (&<>"') and split
    into <p> blocks at word boundaries, sized by ``para_words``."""
    import html as _html

    words = text.split(" ")
    paras = [
        "<p class=\"c%d\">%s</p>"
        % (i // para_words, _html.escape(" ".join(words[i : i + para_words])))
        for i in range(0, max(len(words), 1), para_words)
    ]
    return (
        "<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n<title></title>\n"
        "<meta property=\"og:url\" content=\"" + _html.escape(url) + "\"/>\n"
        "<style type=\"text/css\">p { margin: 0 > auto; }</style>\n"
        "<script defer>if (1 < 2) { var x = \"</div>\"; }</script>\n"
        "</head>\n<body class=\"page\">\n"
        "<!-- boilerplate <nav> below -->\n"
        "<nav><a href=\"/home?a=1&amp;b=2\"><img alt=\"home\"/></a></nav>\n"
        + "\n".join(paras)
        + "\n</body>\n</html>"
    ).encode("utf-8")


def _make_doc(rng: np.random.RandomState, n_tokens: int) -> list[str]:
    return [VOCAB[i] for i in rng.randint(0, len(VOCAB), n_tokens)]


def _token_edit(rng: np.random.RandomState, toks: list[str], n_edits: int) -> list[str]:
    out = list(toks)
    for _ in range(n_edits):
        op = rng.randint(0, 3)
        pos = rng.randint(0, max(len(out) - 1, 1))
        if op == 0 and len(out) > 5:      # delete
            del out[pos]
        elif op == 1:                      # insert
            out.insert(pos, VOCAB[rng.randint(0, len(VOCAB))])
        else:                              # substitute
            out[pos] = VOCAB[rng.randint(0, len(VOCAB))]
    return out


def webtext_corpus_pandas(
    n_docs: int = 1000,
    dup_fraction: float = 0.3,
    seed: int = 42,
    doc_tokens: tuple[int, int] = (40, 160),
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (corpus_df, truth_df) as pandas.

    ~n_docs * (1-dup_fraction) originals; the rest are duplicates of a
    random original: 30% exact copies, 50% token-edit near-dups, 20%
    long-span substring overlaps (shared >=50-token boilerplate span).
    Truth pairs connect every doc to every other member of its cluster,
    canonical url_1 > url_2 (lower-triangle convention, base.py:277-282).
    """
    rng = np.random.RandomState(seed)
    n_orig = max(int(n_docs * (1 - dup_fraction)), 1)
    docs: list[dict] = []
    originals: list[list[str]] = []
    base_ts = dt.datetime(2024, 3, 1)

    for i in range(n_orig):
        toks = _make_doc(rng, rng.randint(*doc_tokens))
        originals.append(toks)
        url = f"https://site{i % 97}.example.com/page/{i:07d}"
        docs.append({
            "url": url,
            "warc_ts": base_ts + dt.timedelta(minutes=int(rng.randint(0, 60 * 24 * 30))),
            "text": " ".join(toks),
            "lang": LANGS[rng.randint(0, len(LANGS))],
            "_cluster": i,
            "_dup_kind": "original",
        })

    for j in range(n_docs - n_orig):
        src = int(rng.randint(0, n_orig))
        toks = originals[src]
        kind_draw = rng.rand()
        if kind_draw >= 0.80 and len(toks) < 80:
            kind_draw = 0.5  # too short for a guaranteed >=50-token span
        if kind_draw < 0.30:
            new_toks, kind = list(toks), "exact"
        elif kind_draw < 0.80:
            n_edits = max(1, int(len(toks) * rng.uniform(0.02, 0.10)))
            new_toks, kind = _token_edit(rng, toks, n_edits), "near"
        else:
            # long-span overlap: keep a >=50-token span, fresh surroundings
            span_len = min(len(toks), int(rng.randint(50, 80)))
            start = int(rng.randint(0, max(len(toks) - span_len, 1)))
            span = toks[start : start + span_len]
            new_toks = (
                _make_doc(rng, int(rng.randint(10, 40)))
                + span
                + _make_doc(rng, int(rng.randint(10, 40)))
            )
            kind = "span"
        url = f"https://mirror{j % 53}.example.org/copy/{j:07d}"
        docs.append({
            "url": url,
            "warc_ts": base_ts + dt.timedelta(minutes=int(rng.randint(0, 60 * 24 * 30))),
            "text": " ".join(new_toks),
            "lang": docs[src]["lang"],
            "_cluster": src,
            "_dup_kind": kind,
        })

    corpus = pd.DataFrame(docs)
    corpus["html"] = [
        render_html(t, u) for t, u in zip(corpus["text"], corpus["url"])
    ]

    # truth pairs: all within-cluster pairs, EXCEPT span-dups which are only
    # "substring duplicates" — they pair with the cluster but with kind 'span'
    by_cluster: dict[int, list[tuple[str, str]]] = {}
    for _, row in corpus.iterrows():
        by_cluster.setdefault(row["_cluster"], []).append((row["url"], row["_dup_kind"]))
    pairs = []
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (u1, k1), (u2, k2) = members[i], members[j]
                hi, lo = (u1, u2) if u1 > u2 else (u2, u1)
                # pair kind: identical texts only when both sides are the
                # original or exact copies of it. 'span' is reserved for
                # pairs with a GUARANTEED >=50-token shared run — a span
                # dup vs the original or vs a byte-identical exact copy.
                # Two span dups may keep DISJOINT windows of the original
                # (and a near dup's edits can fall inside the window), so
                # those pairs are 'span_weak': cluster-implied but not
                # detectable by any pass in general — keep them out of
                # pass-level recall denominators (session-8 review fix).
                if "span" in (k1, k2):
                    other = k2 if k1 == "span" else k1
                    kind = "span" if other in ("original", "exact") else "span_weak"
                elif {k1, k2} <= {"original", "exact"}:
                    kind = "exact"
                else:
                    kind = "near"
                pairs.append({"url_1": hi, "url_2": lo, "kind": kind})
    truth = pd.DataFrame(pairs, columns=["url_1", "url_2", "kind"])
    return corpus, truth


def webtext_corpus(
    spark: SparkSession, n_docs: int = 1000, dup_fraction: float = 0.3, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    corpus_pd, truth_pd = webtext_corpus_pandas(n_docs, dup_fraction, seed)
    corpus = spark.createDataFrame(
        corpus_pd[["url", "warc_ts", "html", "text", "lang", "_dup_kind"]]
    )
    truth = (
        spark.createDataFrame(truth_pd)
        if len(truth_pd)
        else spark.createDataFrame([], "url_1 string, url_2 string, kind string")
    )
    return corpus, truth


def _doc_tokens_for_id(doc_id: int, seed: int, lo: int, hi: int) -> list[str]:
    """Deterministic token sequence for a doc id — regenerable on any
    executor without shipping the corpus (the scale path's key property)."""
    rng = np.random.RandomState((seed * 1_000_003 + doc_id) % (2**31 - 1))
    return [VOCAB[i] for i in rng.randint(0, len(VOCAB), rng.randint(lo, hi))]


def webtext_corpus_distributed(
    spark: SparkSession,
    n_docs: int,
    dup_fraction: float = 0.3,
    seed: int = 42,
    doc_tokens: tuple[int, int] = (40, 160),
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Distributed twin of :func:`webtext_corpus`: generation runs in
    ``mapInPandas`` over ``spark.range`` — no driver materialization, so
    bench corpora of millions of docs are cheap. Ids < n_orig are
    originals; id i >= n_orig duplicates original ``hash(i) % n_orig``
    (exact / token-edit / long-span kinds by a deterministic draw).

    Returns (corpus, truth) where truth holds (url_1 > url_2, kind) for the
    direct (dup, original) and (dup, dup) pairs within each cluster.

    The corpus carries the full input_hint shape
    (url, warc_ts, html binary, text, lang) plus doc_id/_cluster/_dup_kind;
    dedup jobs read only (id, text), so Parquet column pruning drops the
    heavy html payload at the scan — the plans prove it.
    """
    import datetime as _dt

    import pandas as pd  # local import for executors

    n_orig = max(int(n_docs * (1 - dup_fraction)), 1)
    lo, hi = doc_tokens
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "url": [], "warc_ts": [], "html": [],
                    "text": [], "lang": [], "_cluster": [], "_dup_kind": []}
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                if doc_id < n_orig:
                    toks = _doc_tokens_for_id(doc_id, seed, lo, hi)
                    kind, cluster = "original", doc_id
                    url = f"https://site{doc_id % 97}.example.com/page/{doc_id:09d}"
                else:
                    rng = np.random.RandomState((seed * 7_000_003 + doc_id) % (2**31 - 1))
                    cluster = int(rng.randint(0, n_orig))
                    toks = _doc_tokens_for_id(cluster, seed, lo, hi)
                    draw = rng.rand()
                    if draw >= 0.80 and len(toks) < 80:
                        draw = 0.5
                    if draw < 0.30:
                        kind = "exact"
                    elif draw < 0.80:
                        kind = "near"
                        n_edits = max(1, int(len(toks) * rng.uniform(0.02, 0.10)))
                        toks = _token_edit(rng, list(toks), n_edits)
                    else:
                        kind = "span"
                        span_len = min(len(toks), int(rng.randint(50, 80)))
                        start = int(rng.randint(0, max(len(toks) - span_len, 1)))
                        span = toks[start : start + span_len]
                        toks = (
                            _make_doc(rng, int(rng.randint(10, 40)))
                            + span
                            + _make_doc(rng, int(rng.randint(10, 40)))
                        )
                    url = f"https://mirror{doc_id % 53}.example.org/copy/{doc_id:09d}"
                rows["doc_id"].append(doc_id)
                rows["url"].append(url)
                text = " ".join(toks)
                rows["text"].append(text)
                rows["warc_ts"].append(
                    _dt.datetime(2024, 1, 1)
                    + _dt.timedelta(minutes=(doc_id * 37) % (60 * 24 * 30))
                )
                rows["html"].append(render_html(text, url))
                rows["lang"].append(LANGS[cluster % len(LANGS)])
                rows["_cluster"].append(cluster)
                rows["_dup_kind"].append(kind)
            yield pd.DataFrame(rows)

    base = spark.range(n_docs, numPartitions=parts)
    corpus = base.mapInPandas(
        gen,
        "doc_id long, url string, warc_ts timestamp, html binary, "
        "text string, lang string, _cluster long, _dup_kind string",
    )
    from pyspark.sql import functions as F

    members = corpus.select("url", "_cluster", "_dup_kind")
    a = members.toDF("url_1", "_cluster", "k1")
    b = members.toDF("url_2", "_cluster", "k2")
    truth = (
        a.join(b, "_cluster")
        .filter(F.col("url_1") > F.col("url_2"))
        .select(
            "url_1",
            "url_2",
            # same kind rules as the pandas twin: 'span' only when the
            # >=50-token shared run is GUARANTEED (span vs original/exact);
            # span-vs-near/span pairs are 'span_weak' (session-8 fix)
            F.when(
                ((F.col("k1") == "span") | (F.col("k2") == "span"))
                & F.col("k1").isin("original", "exact", "span")
                & F.col("k2").isin("original", "exact", "span")
                & ~((F.col("k1") == "span") & (F.col("k2") == "span")),
                F.lit("span"),
            )
            .when(
                (F.col("k1") == "span") | (F.col("k2") == "span"),
                F.lit("span_weak"),
            )
            .when(
                F.col("k1").isin("original", "exact")
                & F.col("k2").isin("original", "exact"),
                F.lit("exact"),
            )
            .otherwise(F.lit("near"))
            .alias("kind"),
        )
    )
    return corpus, truth


GIVEN_NAMES = (
    "james mary john linda robert susan michael karen david nancy william "
    "lisa richard betty joseph helen thomas sandra charles donna anna peter"
).split()
SURNAMES = (
    "smith johnson williams brown jones garcia miller davis wilson moore "
    "taylor anderson thomas jackson white harris martin thompson young king"
).split()
SUBURBS = (
    "richmond brunswick carlton fitzroy prahran toorak kew hawthorn balwyn "
    "essendon preston coburg northcote thornbury reservoir fairfield"
).split()
STATES = ["vic", "nsw", "qld", "wa", "sa", "tas"]


def _corrupt_string(rng: np.random.RandomState, s: str) -> str:
    """One FEBRL-style typographic corruption: substitute / delete /
    insert / transpose a character (datasets/febrl.py docstrings describe
    the same error model)."""
    if not s:
        return s
    op = rng.randint(0, 4)
    pos = int(rng.randint(0, len(s)))
    ch = chr(ord("a") + rng.randint(0, 26))
    if op == 0:
        return s[:pos] + ch + s[pos + 1:]
    if op == 1 and len(s) > 2:
        return s[:pos] + s[pos + 1:]
    if op == 2:
        return s[:pos] + ch + s[pos:]
    if pos < len(s) - 1:
        return s[:pos] + s[pos + 1] + s[pos] + s[pos + 2:]
    return s


def person_corpus_pandas(
    n_originals: int = 1000,
    max_dups_per_rec: int = 3,
    seed: int = 42,
) -> pd.DataFrame:
    """FEBRL-shaped person records with planted duplicates (FIXTURES.md F3;
    mirrors the roles of the bundled febrl1-4 datasets,
    recordlinkage/datasets/febrl.py:52-231).

    rec_id follows the FEBRL convention ``rec-<n>-org`` /
    ``rec-<n>-dup-<k>`` so truth links derive from the id alone
    (febrl.py:30-49); duplicates carry 1-3 typographic corruptions across
    random fields."""
    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    for i in range(n_originals):
        rec = {
            "rec_id": f"rec-{i}-org",
            "given_name": GIVEN_NAMES[rng.randint(0, len(GIVEN_NAMES))],
            "surname": SURNAMES[rng.randint(0, len(SURNAMES))],
            "street_number": str(rng.randint(1, 400)),
            "address_1": f"{SURNAMES[rng.randint(0, len(SURNAMES))]} street",
            "suburb": SUBURBS[rng.randint(0, len(SUBURBS))],
            "postcode": f"{rng.randint(2000, 8000):04d}",
            "state": STATES[rng.randint(0, len(STATES))],
            "date_of_birth": f"{rng.randint(1940, 2005):04d}{rng.randint(1, 13):02d}{rng.randint(1, 29):02d}",
            "soc_sec_id": f"{rng.randint(10**6, 10**7 - 1)}",
        }
        rows.append(rec)
        for k in range(int(rng.randint(0, max_dups_per_rec + 1))):
            dup = dict(rec)
            dup["rec_id"] = f"rec-{i}-dup-{k}"
            n_err = 1 + int(rng.randint(0, 3))
            fields = rng.choice(
                ["given_name", "surname", "address_1", "suburb", "postcode",
                 "date_of_birth"],
                size=n_err, replace=False,
            )
            for f_ in fields:
                dup[f_] = _corrupt_string(rng, dup[f_])
            rows.append(dup)
    return pd.DataFrame(rows)


def person_corpus(spark: SparkSession, n_originals: int = 1000,
                  max_dups_per_rec: int = 3, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(person_corpus_pandas(n_originals, max_dups_per_rec, seed))


def person_truth_links(df: DataFrame, id_col: str = "rec_id") -> DataFrame:
    """True duplicate pairs from FEBRL rec ids: regex-extract the record
    number, self-join on it, keep the lower triangle — the exact derivation
    of recordlinkage/datasets/febrl.py:30-49 as DataFrame ops."""
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(id_col),
        F.regexp_extract(F.col(id_col), r"rec-(\d+)", 1).cast("long").alias("_rec_n"),
    )
    a = keyed.select(F.col(id_col).alias("id_1"), "_rec_n")
    b = keyed.select(F.col(id_col).alias("id_2"), "_rec_n")
    return (
        a.join(b, "_rec_n")
        .filter(F.col("id_1") > F.col("id_2"))
        .select("id_1", "id_2")
    )


def binary_vectors(
    spark: SparkSession,
    n: int = 10000,
    n_match: int = 2000,
    m=None,
    u=None,
    random_state: int = 535,
) -> tuple[DataFrame, DataFrame]:
    """Seeded binary comparison vectors + truth pairs — the classifier
    oracle (recordlinkage/datasets/generate.py:5-89; parameters pinned by
    tests/test_classify.py:44-59). Returns (features, truth) where features
    has columns (id_1, id_2, c_1..c_k)."""
    m = list(m if m is not None else [0.92, 0.81, 0.85, 0.90, 0.99, 0.70, 0.56])
    u = list(u if u is not None else [0.19, 0.23, 0.50, 0.11, 0.20, 0.14, 0.50])
    if len(m) != len(u):
        raise ValueError("m and u must have the same length")
    rng = np.random.RandomState(random_state)
    k = len(m)
    X = np.empty((n, k), dtype=np.int8)
    y_match = np.zeros(n, dtype=bool)
    y_match[:n_match] = True
    for j in range(k):
        X[:n_match, j] = (rng.rand(n_match) < m[j]).astype(np.int8)
        X[n_match:, j] = (rng.rand(n - n_match) < u[j]).astype(np.int8)
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"id_1": ids * 2 + 1, "id_2": ids * 2})
    for j in range(k):
        pdf[f"c_{j + 1}"] = X[:, j].astype(float)
    features = spark.createDataFrame(pdf)
    truth = spark.createDataFrame(pdf.loc[y_match, ["id_1", "id_2"]])
    return features, truth
