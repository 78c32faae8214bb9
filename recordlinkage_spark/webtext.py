"""Web-corpus preprocessing operators: URL canonicalization and CCNet-style
corpus-level duplicated-line removal.

These extend the reference's cleaning family (reference
recordlinkage/preprocessing/cleaning.py:10-87 normalizes free-text columns
before comparison) to the web-page input shape of the north rule
(url/warc_ts/html/text/lang): before any MinHash/SimHash pass, a web corpus
is first normalized by url (so http://WWW.a.com/x?utm_source=y and
https://a.com/x dedup exactly) and stripped of corpus-level boilerplate
lines (the CCNet recipe: Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", §3.1 — drop every
paragraph whose normalized hash occurs more than once in the corpus).

Scale design (100 TB):

- ``canonical_url`` is a pure JVM column expression chain (regexp + array
  built-ins, whole-stage codegen, no Python, no shuffle) — it runs inline
  with the Iceberg scan, so url-keyed exact dedup costs one hash-aggregate
  on the *canonical* key instead of a Python pass over every url.
- ``line_dedup`` is explode -> one hash-aggregate on the normalized line
  key (map-side partial aggregation absorbs hot boilerplate keys: a nav
  bar appearing on 10^9 pages combines to one row per map task before the
  shuffle) -> join of the *duplicated-key* table back to the lines (the
  dup-key side is the aggregated output, orders of magnitude smaller than
  the corpus; AQE broadcasts it when it fits, and its skew-join handles
  stragglers otherwise) -> one groupBy(doc) to reassemble. Three
  exchanges of the exploded-line table worst case, two when the dup-key
  table broadcasts. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .textfns import bind_once

# Query parameters that never change page identity (analytics / click
# tracking); stripped before canonical comparison.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref|igshid)(=|$)"

_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*"


def canonical_url(url_col: Column) -> Column:
    """RFC 3986 §6-style canonical form as a JVM-only column expression.

    Normalizations (each deterministic and DuckDB-oracle-verified):
      1. strip the fragment (``#...``);
      2. lowercase scheme and authority (path/query case is preserved —
         paths are case-significant on most origins);
      3. drop default ports (``:80`` for http, ``:443`` for https);
      4. drop a leading ``www.`` host label;
      5. strip trailing slashes from the path;
      6. drop tracking query params (``TRACKING_PARAM_RE``) and empty
         params, then sort the survivors bytewise and rejoin.

    Non-absolute inputs (no ``scheme://``) pass through steps 1/5/6 only.
    Null in -> null out.
    """
    u = F.trim(url_col)
    u = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)

    scheme_host = F.regexp_extract(base, _SCHEME_HOST_RE, 0)
    path = F.regexp_replace(base, _SCHEME_HOST_RE, "")

    sh = F.lower(scheme_host)
    sh = F.regexp_replace(sh, r"^(http://.*):80$", "$1")
    sh = F.regexp_replace(sh, r"^(https://.*):443$", "$1")
    sh = F.regexp_replace(sh, r"^(https?://)www\.", "$1")

    path = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")

    return F.concat(
        sh, path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )


def url_host(url_col: Column) -> Column:
    """Lowercased host (no port, no www-strip) — the blocking key for
    host-local passes (e.g. per-site boilerplate removal). A trailing
    root-dot (``example.com.`` — valid DNS, same origin as
    ``example.com``) is stripped: otherwise ``host_suffixes`` would
    yield ``['example.com.', 'com.', '']`` and a blocklist entry
    ``example.com`` would be trivially evadable."""
    auth = F.regexp_extract(F.trim(url_col), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    return F.lower(F.regexp_replace(F.regexp_replace(auth, r":\d+$", ""), r"\.+$", ""))


def normalized_line(line_col: Column) -> Column:
    """CCNet paragraph normalization (Wenzek et al. 2020 §3.1): lowercase,
    drop digits, drop everything outside [a-z ], collapse whitespace, trim.
    SQL-portable by construction (ASCII character classes only)."""
    s = F.lower(line_col)
    s = F.regexp_replace(s, r"[0-9]+", "")
    s = F.regexp_replace(s, r"[^a-z ]", "")
    s = F.regexp_replace(s, r" +", " ")
    return F.trim(s)


def _gopher_feature_exprs(
    lines: Column, words: Column, text_col: Column
) -> dict[str, Column]:
    """The Gopher feature expressions over ALREADY-BOUND line/token array
    columns (lambda variables or attributes — O(1) to reference; see
    textfns.bind_once). Callers: :func:`gopher_quality_features` (dict
    API, one binding per feature) and :func:`gopher_quality_struct`
    (one binding for all nine).

    The only non-obvious trick: ``top_{2,3}gram_char_frac`` needs the count
    of the doc's most frequent word n-gram, which is a sort + one linear
    fold instead of a per-doc groupBy — ``array_sort`` the n-gram array,
    then ``F.aggregate`` a (prev, run, best) struct to find the longest
    equal-run. O(n log n) JVM work per doc, zero shuffles.
    """
    n_lines = F.size(lines)
    n_words = F.size(words)
    n_chars = F.length(text_col)

    def _safe_div(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    # duplicated-line fractions: line occurrences beyond the first are
    # "duplicate"; char-weighted variant counts their characters
    distinct_lines = F.array_distinct(lines)
    sum_len = lambda arr: F.coalesce(  # noqa: E731
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)),
        F.lit(0).cast("long"),
    )
    dup_line_frac = _safe_div(n_lines - F.size(distinct_lines), n_lines)
    dup_line_char_frac = _safe_div(sum_len(lines) - sum_len(distinct_lines),
                                   sum_len(lines))

    def _ngrams(n: int) -> Column:
        # `words` is already bound by the caller, so referencing it from
        # the per-element lambda is O(1) — no re-tokenization
        return F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def _top_ngram_char_frac(n: int) -> Column:
        # chars covered by the most frequent n-gram: its multiplicity times
        # its token-char length (n-1 joining spaces included, as in the
        # published heuristic's character accounting)
        grams = _ngrams(n)
        sorted_g = F.array_sort(grams)
        folded = F.aggregate(
            sorted_g,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
                F.lit("").alias("bestg"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1).cast("long")
                    ),
                ).alias("best"),
                F.when(
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1).cast("long")
                    )
                    > acc["best"],
                    x,
                )
                .otherwise(acc["bestg"])
                .alias("bestg"),
            ),
        )
        covered = folded["best"] * F.length(folded["bestg"])
        return F.when(F.size(grams) > 0, _safe_div(covered, n_chars)).otherwise(
            F.lit(0.0)
        )

    mean_word_len = _safe_div(sum_len(words), n_words)
    # symbols per word: '#' occurrences + ellipsis occurrences ("..." or "…")
    n_hash = F.length(text_col) - F.length(F.regexp_replace(text_col, r"#", ""))
    n_ellipsis = F.size(F.split(text_col, r"\.\.\.|…", -1)) - 1
    symbol_word_ratio = _safe_div(n_hash + n_ellipsis, n_words)
    alpha_word_frac = _safe_div(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), n_words
    )
    ellipsis_line_frac = _safe_div(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))),
        n_lines,
    )

    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_2gram_char_frac": _top_ngram_char_frac(2),
        "top_3gram_char_frac": _top_ngram_char_frac(3),
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_word_ratio,
        "alpha_word_frac": alpha_word_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
    }


GOPHER_FEATURES = (
    "n_lines", "dup_line_frac", "dup_line_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "mean_word_len",
    "symbol_word_ratio", "alpha_word_frac", "ellipsis_line_frac",
)


def _gopher_arrays(text_col: Column, split_re: str) -> Column:
    """struct(ls, ws, t): the line array, the non-empty token array, and
    the text itself — everything the feature expressions read, packaged so
    one ``bind_once`` evaluates the splits exactly once per row."""
    return F.struct(
        F.split(text_col, split_re, -1).alias("ls"),
        F.filter(F.split(F.trim(text_col), r"\s+"), lambda w: w != "").alias(
            "ws"
        ),
        text_col.alias("t"),
    )


def gopher_quality_features(
    text_col: Column, split_re: str = r"\n"
) -> dict[str, Column]:
    """Gopher repetition/quality signals (Rae et al. 2021, appendix A1
    subset) as SHUFFLE-FREE column expressions — every feature is computed
    per row from the doc's own line/token arrays, so at 100 TB the whole
    filter runs inline with the Iceberg scan (one projection, no exchange,
    no Python).

    Returns a dict of named Columns (keys = :data:`GOPHER_FEATURES`).
    Each dict entry tokenizes the doc ONCE (its own ``bind_once``); when
    selecting several features at once, prefer
    :func:`with_gopher_features`, which tokenizes once for ALL nine
    (HOF-bearing expressions are excluded from Catalyst's common-
    subexpression elimination, so independent columns cannot share the
    splits). Empty/degenerate docs get 0.0 for every ratio (no null/NaN
    leaks)."""
    arrays = _gopher_arrays(text_col, split_re)

    def one(key: str) -> Column:
        return bind_once(
            arrays,
            lambda s: _gopher_feature_exprs(s["ls"], s["ws"], s["t"])[key],
        )

    return {k: one(k) for k in GOPHER_FEATURES}


def gopher_quality_struct(text_col: Column, split_re: str = r"\n") -> Column:
    """All nine Gopher features as ONE struct column computed from a single
    tokenization per row. Materialize it with ``withColumn`` and read the
    fields as attribute extractions (:func:`with_gopher_features`) —
    Catalyst's CollapseProject keeps a multi-referenced non-cheap alias in
    its own Project, so the struct is evaluated exactly once
    (plan-asserted in tests/test_webtext.py)."""
    arrays = _gopher_arrays(text_col, split_re)
    return bind_once(
        arrays,
        lambda s: F.struct(
            *[
                c.alias(k)
                for k, c in _gopher_feature_exprs(
                    s["ls"], s["ws"], s["t"]
                ).items()
            ]
        ),
    )


def with_gopher_features(
    df: DataFrame, text_col: str, split_re: str = r"\n", prefix: str = ""
) -> DataFrame:
    """df + the nine Gopher feature columns, ONE tokenization per row: the
    struct is materialized as a column first, then fields are extracted as
    attribute reads in a second projection (which CollapseProject provably
    leaves alone — see :func:`gopher_quality_struct`)."""
    g = "_gopher__"
    out = df.withColumn(g, gopher_quality_struct(F.col(text_col), split_re))
    return out.select(
        *[c for c in df.columns],
        *[F.col(g)[k].alias(prefix + k) for k in GOPHER_FEATURES],
    )


# PII regexes kept deliberately inside the intersection of Java-regex
# (Spark JVM) and RE2 (DuckDB oracle) semantics: no lookaround, no
# backreferences, explicit ASCII classes (Java \s includes \x0B, RE2's does
# not — so the whitespace class is spelled out).
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)
PII_PHONE_RE = r"\+?[0-9][0-9()\- \t\n\r.]{6,}[0-9]"


def redact_pii(text_col: Column) -> dict[str, Column]:
    """PII scrubbing for web corpora as a shuffle-free JVM projection:
    emails, IPv4 addresses, and phone-shaped digit runs are replaced with
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens, applied in that order
    (the IPv4 pass must run before the phone pass — a dotted quad is also
    a phone-shaped digit run). Heuristic by design, like every published
    corpus scrubber: counts are non-overlapping regex matches, each
    counted on the text state its own pass sees.

    Returns named Columns: ``text_redacted``, ``n_emails``, ``n_ipv4``,
    ``n_phones``. Pure ``regexp_replace``/``split`` expressions — zero
    Python, zero shuffle, runs inline with the scan at 100 TB.
    """

    def _count(col: Column, pattern: str) -> Column:
        return (F.size(F.split(col, pattern, -1)) - 1).cast("long")

    n_emails = _count(text_col, PII_EMAIL_RE)
    t1 = F.regexp_replace(text_col, PII_EMAIL_RE, "<EMAIL>")
    n_ipv4 = _count(t1, PII_IPV4_RE)
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phones = _count(t2, PII_PHONE_RE)
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return {
        "text_redacted": t3,
        "n_emails": n_emails,
        "n_ipv4": n_ipv4,
        "n_phones": n_phones,
    }


def _token_ngrams(text_col: Column, n: int) -> Column:
    """Distinct lowercase whitespace-token n-grams of a text column as an
    array<string>, entirely in JVM expressions (split/transform/slice).
    Docs with fewer than n tokens yield an empty array."""
    toks = F.filter(F.split(F.lower(F.trim(text_col)), r"\s+"), lambda w: w != "")
    # bind_once: referencing the computed `toks` from inside the
    # per-element lambda would re-tokenize the doc once per n-gram
    grams = bind_once(toks, lambda ts: F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - n),
            lambda i: F.array_join(F.slice(ts, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>")))
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    min_overlaps: int = 1,
    use_hash: bool = True,
) -> DataFrame:
    """Benchmark decontamination for training corpora (the GPT-3 recipe,
    Brown et al. 2020 appendix C: a training document is contaminated if it
    shares any length-``n`` token n-gram with an evaluation benchmark;
    n=13 is the published default).

    Returns one row per input doc:
      (id_col, n_overlap_grams long, contaminated boolean)
    where ``n_overlap_grams`` counts the doc's DISTINCT n-grams that occur
    anywhere in the benchmark, and ``contaminated`` is
    ``n_overlap_grams >= min_overlaps``.

    Scale design (100 TB corpus, small benchmark — the realistic shape):

    - Both sides' n-grams are pure JVM array expressions (no Python).
    - The benchmark side is aggregated to its distinct gram set (tiny: a
      few eval suites) and explicitly ``broadcast()``; the corpus side is
      exploded and joined with a BroadcastHashJoin — the 100 TB side
      NEVER shuffles to find its matches (tests assert the corpus side of
      the plan has no Exchange before the join).
    - Only matched (doc, gram) rows survive the inner join, so the
      per-doc overlap groupBy shuffles matched rows only — at realistic
      contamination rates orders of magnitude below corpus size. The
      final flags table (matched ids only) joins back to the doc-id list;
      AQE broadcasts it when it fits.
    - ``use_hash=True`` (default) joins on ``xxhash64(gram)`` instead of
      the gram string — 8-byte keys instead of ~7*n-byte strings through
      the explode and join. A 64-bit collision can only ADD a false
      contamination flag (never miss one); at |benchmark grams| ~ 1e7 the
      per-gram false-hit probability is ~5e-13. The driver oracle query
      runs ``use_hash=False`` for exact string semantics; a pytest
      differential asserts both paths agree end-to-end.
    """
    bench_text = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(_token_ngrams(F.col(bench_text), n)).alias("gram")
    ).distinct()
    corpus_grams = docs.select(
        F.col(id_col), F.explode(_token_ngrams(F.col(text_col), n)).alias("gram")
    )
    if use_hash:
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
        corpus_grams = corpus_grams.select(
            id_col, F.xxhash64("gram").alias("gram")
        )
    overlaps = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_overlap_grams"))
    )
    return (
        docs.select(id_col)
        .join(overlaps, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_grams", F.lit(0).cast("long")).alias(
                "n_overlap_grams"
            ),
            (F.coalesce("n_overlap_grams", F.lit(0)) >= min_overlaps).alias(
                "contaminated"
            ),
        )
    )


def dedup_lines_within_doc(
    text_col: Column,
    split_re: str = r"\n",
    join_sep: str = "\n",
) -> dict[str, Column]:
    """In-DOCUMENT repeated-line removal: keep the FIRST occurrence of
    every line whose normalized form (``normalized_line``) repeats
    inside the same doc, drop the later copies, preserve original order
    — the extraction-hygiene pass (RefinedWeb §3.1.3 / SlimPajama style)
    that strips nav menus, cookie banners and footers repeating WITHIN
    one page. The corpus-level cousin is ``line_dedup`` (CCNet, drops
    every copy of corpus-frequent lines); this pass needs no corpus
    statistics, so it stays a PURE projection: zero shuffle, zero UDF,
    fuses into any scan at any corpus size.

    Lines whose normalized form is empty (blank separators, pure
    digits/punctuation) are always kept, mirroring ``line_dedup``.

    Cost: first-occurrence detection is ONE ``aggregate`` fold that
    carries the seen-key set forward — O(n_lines x distinct-keys) per
    doc with ``pairs`` evaluated exactly once. It must NOT instead
    probe the key array from inside a per-element lambda (e.g.
    ``array_position(keys, ...)``): Spark re-evaluates captured outer
    expressions on EVERY element — no hoisting out of HOF lambda
    scopes — which turns the pass into O(n_lines^2) re-splits and
    re-normalizations of the whole document (measured minutes-per-rep
    vs seconds on the 2M-doc control corpus; plan-regression-tested in
    tests/test_webtext.py). Corpus-scale repetition is ``line_dedup``'s
    job, not this one's.

    Returns a dict of columns with ``line_dedup``'s output contract:
    ``text_deduped`` (string), ``n_lines``, ``n_removed``,
    ``chars_removed`` (long).
    """
    lines = F.split(text_col, split_re, -1)
    pairs = F.zip_with(
        lines, F.transform(lines, normalized_line),
        lambda l, k: F.struct(l.alias("line"), k.alias("key")),
    )
    empty = F.array().cast("array<string>")
    zero = F.lit(0).cast("long")
    folded = F.aggregate(
        pairs,
        F.struct(
            empty.alias("kept"),
            empty.alias("seen"),
            zero.alias("n_removed"),
            zero.alias("chars_removed"),
        ),
        lambda acc, s: F.when(
            (s["key"] == F.lit(""))
            | ~F.array_contains(acc["seen"], s["key"]),
            F.struct(
                F.array_append(acc["kept"], s["line"]).alias("kept"),
                F.when(s["key"] == F.lit(""), acc["seen"])
                .otherwise(F.array_append(acc["seen"], s["key"]))
                .alias("seen"),
                acc["n_removed"].alias("n_removed"),
                acc["chars_removed"].alias("chars_removed"),
            ),
        ).otherwise(
            F.struct(
                acc["kept"].alias("kept"),
                acc["seen"].alias("seen"),
                (acc["n_removed"] + F.lit(1)).alias("n_removed"),
                (acc["chars_removed"] + F.length(s["line"]).cast("long"))
                .alias("chars_removed"),
            )
        ),
    )
    # coalesce ALL counts, not only chars_removed: for null text the
    # fold/size yield NULL, but the documented line_dedup output contract
    # is zero counts with text_deduped NULL (session-8 review fix)
    return {
        "text_deduped": F.array_join(folded["kept"], join_sep),
        "n_lines": F.coalesce(F.size(lines).cast("long"), zero),
        "n_removed": F.coalesce(folded["n_removed"], zero),
        "chars_removed": F.coalesce(folded["chars_removed"], zero),
    }


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_re: str = r"\n",
    join_sep: str = "\n",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level duplicated-line removal (CCNet §3.1): drop EVERY copy
    of any line whose normalized form occurs >= ``min_count`` times across
    the whole corpus; reassemble each doc from its surviving lines in
    original order.

    Lines whose normalized form is empty (pure digits/punctuation/space)
    are never counted and always kept — otherwise every blank separator
    line in the corpus would vanish.

    Returns one row per input doc (docs whose lines ALL drop still appear,
    with ``text_deduped = ''``; docs with NULL text appear with
    ``text_deduped = NULL`` and zero counts — ``posexplode`` alone would
    silently drop them, breaking rows-in == rows-out reconciliation):
      (id_col, text_deduped string, n_lines long, n_removed long,
       chars_removed long).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_re, -1)).alias("pos", "line"),
    ).withColumn("norm", normalized_line(F.col("line")))

    dup_keys = (
        lines.filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("norm", F.lit(True).alias("is_dup"))
    )

    flagged = (
        lines.join(dup_keys, "norm", "left")
        .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    )

    structs = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("line"), F.col("is_dup")))
    )
    kept = F.filter(structs, lambda s: ~s["is_dup"])
    out = flagged.groupBy(id_col).agg(
        F.array_join(F.transform(kept, lambda s: s["line"]), join_sep).alias(
            "text_deduped"
        ),
        F.size(structs).cast("long").alias("n_lines"),
        (F.size(structs) - F.size(kept)).cast("long").alias("n_removed"),
        F.coalesce(
            F.aggregate(
                F.filter(structs, lambda s: s["is_dup"]),
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s["line"]).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("chars_removed"),
    )
    # posexplode emits ZERO rows for null text, so null-text docs never
    # reach the aggregate; join the id list back so the one-row-per-doc
    # contract holds. Both sides are id-keyed and the right side is the
    # aggregated output, so this is a cheap id-to-id join; AQE broadcasts
    # it when small. The join is NULL-SAFE so a null-id doc still gets its
    # aggregated row back (a plain equi-join would silently drop it and
    # return NULL text/zero counts). Precondition: ``id_col`` should be
    # unique — duplicate ids fan out to one identical row per input row,
    # and all null-id docs collapse into ONE shared group (groupBy treats
    # NULL as a single key), so their output row reflects the combined
    # group, not each doc alone.
    zero = F.lit(0).cast("long")
    # rename the aggregated side's key: both frames descend from ``df``, so
    # joining on same-named attributes would resolve to a trivially-true
    # self-comparison
    outr = out.withColumnRenamed(id_col, "__line_dedup_id")
    return df.select(id_col).join(
        outr, F.col(id_col).eqNullSafe(F.col("__line_dedup_id")), "left"
    ).select(
        id_col,
        "text_deduped",
        F.coalesce("n_lines", zero).alias("n_lines"),
        F.coalesce("n_removed", zero).alias("n_removed"),
        F.coalesce("chars_removed", zero).alias("chars_removed"),
    )


def host_suffixes(url_col: Column) -> Column:
    """All dot-suffixes of the URL's host, longest first — e.g.
    ``https://a.b.example.com/x`` -> ``[a.b.example.com, b.example.com,
    example.com, com]``. A host is blocklisted when ANY suffix equals a
    blocklist entry, which is the standard domain-blocklist semantics
    (an entry ``example.com`` blocks every subdomain; cf. the UT1 lists
    RefinedWeb §3.1 filters with). Pure JVM array expression."""
    parts = F.split(url_host(url_col), r"\.")
    return bind_once(parts, lambda ps: F.transform(
        F.sequence(F.lit(1), F.size(ps)),
        lambda i: F.array_join(F.slice(ps, i, F.size(ps)), "."),
    ))


def url_block_reason(
    url_col: Column,
    blocked_hosts: list[str] | None = None,
    blocked_url_patterns: list[str] | None = None,
    allowed_schemes: tuple[str, ...] | None = ("http", "https"),
) -> Column:
    """First-reason-wins block verdict for one URL: ``'scheme'`` when the
    scheme is absent or not in ``allowed_schemes``, ``'host'`` when any
    host dot-suffix is in ``blocked_hosts``, ``'pattern'`` when the full
    URL matches any regex in ``blocked_url_patterns``, else null (kept).

    The URL-filter stage is the FIRST pass of every web-corpus recipe
    (C4 drops bad-word URLs, RefinedWeb applies the UT1 domain
    blocklist before any text work) because it is the cheapest: here it
    is a single JVM projection — literal lists compile into the plan,
    so there is no join, no shuffle, and no Python at any corpus size.
    For blocklists too large to embed in a plan (UT1 is ~4M domains)
    use ``filter_urls(..., blocked_host_df=...)``, which trades the
    literal for per-suffix-depth broadcast hash joins.
    """
    u = F.trim(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    reason = F.lit(None).cast("string")
    if blocked_url_patterns:
        pat = "|".join(f"(?:{p})" for p in blocked_url_patterns)
        reason = F.when(u.rlike(pat), F.lit("pattern")).otherwise(reason)
    if blocked_hosts:
        hit = F.exists(
            host_suffixes(url_col), lambda s: s.isin(*blocked_hosts)
        )
        reason = F.when(hit, F.lit("host")).otherwise(reason)
    if allowed_schemes is not None:
        reason = F.when(
            ~scheme.isin(*[s.lower() for s in allowed_schemes]),
            F.lit("scheme"),
        ).otherwise(reason)
    return reason


def filter_urls(
    df: DataFrame,
    url_col: str,
    blocked_hosts: list[str] | None = None,
    blocked_host_df: DataFrame | None = None,
    blocked_url_patterns: list[str] | None = None,
    allowed_schemes: tuple[str, ...] | None = ("http", "https"),
    suffix_depths: tuple[int, ...] = (0, 2, 3, 4),
    reason_col: str | None = None,
) -> DataFrame:
    """Drop rows whose URL trips the blocklist stage; with ``reason_col``
    set, KEEP all rows and attach the block reason instead (null = kept)
    — the observability mode a pipeline uses to report per-reason drop
    counts to its metrics table.

    Two host-blocklist flavors, both zero-corpus-shuffle:

    - ``blocked_hosts`` (Python list): compiled into the plan as a
      literal ``exists`` over ALL host dot-suffixes — exact suffix
      semantics at any depth, no join. Right up to ~1e4 entries.
    - ``blocked_host_df`` (single-column ``host`` DataFrame): one
      explicitly-``broadcast()`` LEFT hash join per entry in
      ``suffix_depths`` (0 = the full host, k = its last k labels) —
      the corpus side never exchanges, and 4M-domain lists ride the
      broadcast. Depth coverage: an entry with k labels is matched by
      the depth-k join (and the full-host join when equal), so the
      default ``(0,2,3,4)`` covers every registrable domain up to 4
      labels; raise it for deeper entries. Entries deeper than
      ``max(suffix_depths)`` labels are the caller's to add.

    Reason precedence matches ``url_block_reason``: scheme > host >
    pattern.
    """
    u = F.col(url_col)
    base = url_block_reason(
        u,
        blocked_hosts=blocked_hosts,
        blocked_url_patterns=blocked_url_patterns,
        allowed_schemes=allowed_schemes,
    )
    out = df
    if blocked_host_df is not None:
        parts = F.split(url_host(u), r"\.")
        flags = []
        for d in suffix_depths:
            key = (
                url_host(u)
                if d == 0
                else F.when(
                    F.size(parts) >= d,
                    F.array_join(
                        F.slice(parts, F.size(parts) - d + 1, F.lit(d)), "."
                    ),
                )
            )
            flag = f"_blk{d}"
            bl = broadcast(
                blocked_host_df.select(
                    F.col("host").alias(f"_bh{d}"), F.lit(True).alias(flag)
                ).dropDuplicates([f"_bh{d}"])
            )
            out = out.join(bl, key == F.col(f"_bh{d}"), "left").drop(f"_bh{d}")
            flags.append(flag)
        df_hit = F.coalesce(*[F.col(f) for f in flags], F.lit(False))
        # splice the join verdict into the literal chain at 'host' rank:
        # scheme still wins, pattern only fires when neither host path hit
        scheme_hit = base == F.lit("scheme")
        reason = (
            F.when(scheme_hit, F.lit("scheme"))
            .when(df_hit | (base == F.lit("host")), F.lit("host"))
            .otherwise(base)
        )
        out = out.withColumn(reason_col or "_url_block", reason).drop(*flags)
    else:
        out = out.withColumn(reason_col or "_url_block", base)
    if reason_col is None:
        out = out.filter(F.col("_url_block").isNull()).drop("_url_block")
    return out


def dedup_url_keep_latest(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canonicalize: bool = True,
    key_col: str = "url_key",
) -> DataFrame:
    """Exact URL-level recrawl dedup: keep ONE row per (canonical) url —
    the newest ``ts_col`` — the first dedup pass of every Common-Crawl
    pipeline (each monthly crawl re-fetches most pages; CCNet and
    RefinedWeb both collapse recrawls by url before any content pass).
    Extends the reference's exact-key family (``Exact`` compare /
    hash-groupBy dedup) to the survivorship policy web corpora need:
    not "any representative" but "the latest crawl".

    Output: one row per key with columns ``(key_col, n_crawls, *df.columns)``
    — the full surviving row plus how many crawls collapsed into it.
    Rows whose url (canonical) is NULL are unrelated failure records, not
    recrawls — they pass through ungrouped (``key_col`` NULL,
    ``n_crawls`` 1) instead of collapsing into one survivor.

    Determinism contract: the winner is the lexicographic MAX of the
    struct ``(ts, <non-binary columns in df order>, <binary columns>)``,
    so exact ``ts`` ties resolve on the remaining fields — same input,
    same winner, on every run, partitioning, and cluster size (never
    first-seen order). Null ``ts`` sorts lowest: a dated crawl always
    beats an undated one; an all-null-ts group falls through to the
    field tiebreak.

    Scale design (100 TB): ONE hash aggregate — ``groupBy(key).agg(max(
    struct), count(*))``. Map-side partial aggregation keeps one candidate
    row per key per map task before the exchange, so the shuffle carries
    ~|distinct urls| rows, not the corpus; a window ``row_number`` over
    url would instead shuffle AND sort every row. Canonicalization
    (``canonical_url``) fuses into the scan projection — no Python, no
    extra pass. Hot keys cannot skew it: partial aggregation collapses
    any url's recrawls to one row per upstream partition before the
    exchange.
    """
    key_expr = (
        canonical_url(F.col(url_col)) if canonicalize else
        F.col(url_col).cast("string")
    )
    dtypes = dict(df.dtypes)
    payload = list(df.columns)
    # comparison order: ts first, then cheap/cross-engine-orderable fields,
    # binary last — ties resolve before any byte-wise blob comparison
    cmp_order = [c for c in payload if dtypes[c] != "binary"] + [
        c for c in payload if dtypes[c] == "binary"
    ]
    pick = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(c) for c in cmp_order],
    )
    keyed = df.select(key_expr.alias(key_col), pick.alias("_pick"))
    agg = (
        keyed.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.max("_pick").alias("_pick"),
            F.count("*").cast("long").alias("n_crawls"),
        )
    )
    out = agg.select(
        key_col, "n_crawls",
        *[F.col("_pick")[c].alias(c) for c in payload],
    )
    # null-url rows (fetch/parse failures kept for audit) are UNRELATED
    # documents, not recrawls of one page: groupBy would fold them into
    # the single null key and keep exactly one, silently deleting the
    # rest. They pass through ungrouped with n_crawls=1 (session-8
    # review fix).
    nulls = df.filter(key_expr.isNull()).select(
        F.lit(None).cast("string").alias(key_col),
        F.lit(1).cast("long").alias("n_crawls"),
        *payload,
    )
    return out.unionByName(nulls)
