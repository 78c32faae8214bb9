"""webtext.py: URL canonicalization and CCNet-style corpus line dedup."""

from pyspark.sql import functions as F

from recordlinkage_spark import webtext


def _canon_one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(webtext.canonical_url(F.col("url")).alias("c")).first()["c"]


class TestCanonicalUrl:
    def test_full_normalization(self, spark):
        got = _canon_one(
            spark,
            "HTTPS://WWW.Site3.Example.COM:443/Articles/42/"
            "?utm_source=feed&b=2&a=1#frag",
        )
        assert got == "https://site3.example.com/Articles/42?a=1&b=2"

    def test_http_default_port_and_www(self, spark):
        assert (
            _canon_one(spark, "http://WWW.a.com:80/x")
            == "http://a.com/x"
        )

    def test_non_default_port_kept(self, spark):
        assert _canon_one(spark, "http://a.com:8080/x") == "http://a.com:8080/x"

    def test_path_case_preserved(self, spark):
        assert _canon_one(spark, "https://a.com/CaseSensitive") == (
            "https://a.com/CaseSensitive"
        )

    def test_tracking_params_dropped_sorted(self, spark):
        got = _canon_one(
            spark, "https://a.com/p?z=9&utm_campaign=x&gclid=1&fbclid=2&a=1&"
        )
        assert got == "https://a.com/p?a=1&z=9"

    def test_all_params_tracking(self, spark):
        assert _canon_one(spark, "https://a.com/p?utm_source=x") == "https://a.com/p"

    def test_ref_param_exact_only(self, spark):
        # 'ref' drops; 'referrer' (different param) survives
        got = _canon_one(spark, "https://a.com/p?ref=rss&referrer=x")
        assert got == "https://a.com/p?referrer=x"

    def test_root_trailing_slash(self, spark):
        assert _canon_one(spark, "https://a.com/") == "https://a.com"

    def test_non_absolute_passthrough(self, spark):
        assert _canon_one(spark, "relative/path/?b=2&a=1#f") == "relative/path?a=1&b=2"

    def test_null_propagates(self, spark):
        df = spark.createDataFrame([(None,)], "url string")
        assert df.select(webtext.canonical_url(F.col("url")).alias("c")).first()[
            "c"
        ] is None

    def test_equivalent_urls_collide(self, spark):
        variants = [
            "https://www.news.example.org:443/World/item-7?utm_medium=email",
            "HTTPS://News.Example.Org/World/item-7/",
            "https://news.example.org/World/item-7?fbclid=abc#top",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url string")
        got = {
            r["c"]
            for r in df.select(webtext.canonical_url(F.col("url")).alias("c")).collect()
        }
        assert got == {"https://news.example.org/World/item-7"}

    def test_url_host(self, spark):
        df = spark.createDataFrame(
            [("https://WWW.A.com:8443/x?q=1",)], "url string"
        )
        assert df.select(webtext.url_host(F.col("url")).alias("h")).first()["h"] == (
            "www.a.com"
        )


class TestLineDedup:
    def _corpus(self, spark):
        boiler = "Subscribe to our newsletter!"
        rows = [
            ("d1", f"alpha unique one\n{boiler}\nalpha unique two"),
            ("d2", f"{boiler}\nbeta body text"),
            # normalized-equal variant of the boilerplate (case + digits)
            ("d3", "SUBSCRIBE to our 2024 newsletter\ngamma closing line"),
            # doc that is ALL boilerplate -> must still appear, empty text
            ("d4", boiler),
            # blank/punct-only lines normalize to '' and are always kept
            ("d5", "---\ndelta text\n---"),
        ]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_corpus_line_dedup(self, spark):
        out = webtext.line_dedup(self._corpus(spark), "doc_id", "text")
        got = {r["doc_id"]: r.asDict() for r in out.collect()}

        assert set(got) == {"d1", "d2", "d3", "d4", "d5"}
        assert got["d1"]["text_deduped"] == "alpha unique one\nalpha unique two"
        assert got["d1"]["n_lines"] == 3 and got["d1"]["n_removed"] == 1
        assert got["d1"]["chars_removed"] == len("Subscribe to our newsletter!")
        assert got["d2"]["text_deduped"] == "beta body text"
        # the digit/case variant was caught by normalization
        assert got["d3"]["text_deduped"] == "gamma closing line"
        assert got["d4"]["text_deduped"] == "" and got["d4"]["n_removed"] == 1
        # '---' normalizes to '' -> kept even though it repeats
        assert got["d5"]["text_deduped"] == "---\ndelta text\n---"
        assert got["d5"]["n_removed"] == 0

    def test_min_count_threshold(self, spark):
        out = webtext.line_dedup(
            self._corpus(spark), "doc_id", "text", min_count=4
        )
        # boilerplate appears 4x across the corpus (d1,d2,d3-variant,d4)
        got = {r["doc_id"]: r for r in out.collect()}
        assert got["d2"]["text_deduped"] == "beta body text"
        out5 = webtext.line_dedup(
            self._corpus(spark), "doc_id", "text", min_count=5
        )
        got5 = {r["doc_id"]: r for r in out5.collect()}
        assert "Subscribe" in got5["d2"]["text_deduped"]

    def test_order_preserved_many_lines(self, spark):
        # alphabetic ids: digits are stripped by normalization, so numeric
        # suffixes would make every line a corpus-duplicate of the others
        text = "\n".join(f"line {'x' * (i + 1)} unique" for i in range(30))
        df = spark.createDataFrame([("x", text)], "doc_id string, text string")
        out = webtext.line_dedup(df, "doc_id", "text").first()
        assert out["text_deduped"] == text and out["n_removed"] == 0

    def test_plan_shape(self, spark):
        """Partial aggregation must appear before the line-key shuffle —
        the property that absorbs hot boilerplate keys map-side."""
        plan = webtext.line_dedup(
            self._corpus(spark), "doc_id", "text"
        )._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan or "HashAggregate" in plan


class TestGopherQuality:
    """Differential test vs a direct python implementation of the Gopher
    repetition heuristics (Rae et al. 2021 appendix A1 subset)."""

    DOCS = [
        ("g1", "the cat sat\nthe cat sat\nunique tail line"),
        ("g2", "a b a b a b a b"),                       # top-2gram heavy
        ("g3", "word"),                                   # single word
        ("g4", ""),                                       # empty
        ("g5", "read more...\nread more…\nbody text # tag # tag"),
        ("g6", "x y z w v u t s r q p o n m"),            # all-unique grams
    ]

    @staticmethod
    def _py_features(text):
        lines = text.split("\n")
        words = [w for w in text.strip().split() if w]
        n_chars = len(text)

        def div(a, b):
            return a / b if b else 0.0

        dl = len(lines) - len(dict.fromkeys(lines))
        sl = sum(len(l) for l in lines)
        sd = sum(len(l) for l in dict.fromkeys(lines))

        def topgram(n):
            grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
            if not grams:
                return 0.0
            from collections import Counter
            c = Counter(grams)
            best = max(c.values())
            # tie-break identical to the fold: first max run in sorted order
            bestg = None
            for g in sorted(c):
                if c[g] == best:
                    bestg = g
                    break
            return div(best * len(bestg), n_chars)

        import re
        n_hash = text.count("#")
        n_ell = len(re.split(r"\.\.\.|…", text)) - 1
        return {
            "n_lines": len(lines),
            "dup_line_frac": div(dl, len(lines)),
            "dup_line_char_frac": div(sl - sd, sl),
            "top_2gram_char_frac": topgram(2),
            "top_3gram_char_frac": topgram(3),
            "mean_word_len": div(sum(len(w) for w in words), len(words)),
            "symbol_word_ratio": div(n_hash + n_ell, len(words)),
            "alpha_word_frac": div(
                sum(1 for w in words if re.search("[A-Za-z]", w)), len(words)
            ),
            "ellipsis_line_frac": div(
                sum(1 for l in lines if re.search(r"(\.\.\.|…)\s*$", l)),
                len(lines),
            ),
        }

    def test_matches_python_reference(self, spark):
        from recordlinkage_spark.webtext import gopher_quality_features

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        feats = gopher_quality_features(F.col("text"))
        out = df.select("doc_id", *[c.alias(k) for k, c in feats.items()])
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        for doc_id, text in self.DOCS:
            want = self._py_features(text)
            for k, v in want.items():
                assert abs(got[doc_id][k] - v) < 1e-9, (doc_id, k, got[doc_id][k], v)

    def test_no_shuffle_in_plan(self, spark):
        """The whole feature block must be a single projection — zero
        exchanges — so it runs inline with the scan at 100 TB."""
        from recordlinkage_spark.webtext import gopher_quality_features

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        feats = gopher_quality_features(F.col("text"))
        plan = (
            df.select("doc_id", *[c.alias(k) for k, c in feats.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_struct_path_matches_dict_api(self, spark):
        """with_gopher_features (one tokenization for all nine features)
        must agree with the per-feature dict API value-for-value."""
        from recordlinkage_spark.webtext import (
            GOPHER_FEATURES,
            gopher_quality_features,
            with_gopher_features,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        feats = gopher_quality_features(F.col("text"))
        a = {
            r["doc_id"]: r.asDict()
            for r in df.select(
                "doc_id", *[c.alias(k) for k, c in feats.items()]
            ).collect()
        }
        b = {
            r["doc_id"]: r.asDict()
            for r in with_gopher_features(df, "text").drop("text").collect()
        }
        for doc_id, text in self.DOCS:
            for k in GOPHER_FEATURES:
                assert abs(a[doc_id][k] - b[doc_id][k]) < 1e-12, (doc_id, k)

    def test_struct_path_tokenizes_once(self, spark):
        """The struct path must evaluate the split/filter tokenization
        exactly once per row: CollapseProject may not inline the struct
        alias into the nine field extractions (HOF expressions are
        excluded from common-subexpression elimination, so an inlined
        plan would re-tokenize per feature)."""
        from recordlinkage_spark.webtext import with_gopher_features

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        plan = (
            with_gopher_features(df, "text")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("split(trim(") == 1
        assert "Exchange" not in plan


class TestDecontaminate:
    """GPT-3 13-gram benchmark decontamination (Brown et al. 2020 app. C)."""

    def _corpus(self, spark):
        # 14-token benchmark doc; c1 copies a 13-token window of it, c2
        # shares only 12 consecutive tokens, c3 is disjoint, c4 is an
        # exact copy, c5 is too short to have any 13-gram
        bench_text = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13"
        docs = [
            ("c1", "x y " + " ".join(f"b{i}" for i in range(13)) + " z"),
            ("c2", " ".join(f"b{i}" for i in range(12)) + " q r s t u v w"),
            ("c3", " ".join(f"u{i}" for i in range(30))),
            ("c4", bench_text),
            ("c5", "only five little tokens here"),
        ]
        return (
            spark.createDataFrame(docs, "doc_id string, text string"),
            spark.createDataFrame([("bench", bench_text)],
                                  "doc_id string, text string"),
        )

    def test_planted_contamination(self, spark):
        docs, bench = self._corpus(spark)
        got = {
            r["doc_id"]: (r["n_overlap_grams"], r["contaminated"])
            for r in webtext.decontaminate(docs, bench).collect()
        }
        assert got["c1"] == (1, True)       # the b0..b12 window
        assert got["c2"] == (0, False)      # 12 shared tokens < n
        assert got["c3"] == (0, False)
        assert got["c4"] == (2, True)       # both 13-grams of the 14-token doc
        assert got["c5"] == (0, False)
        assert len(got) == 5                # every input doc gets a row

    def test_hash_and_string_paths_agree(self, spark):
        docs, bench = self._corpus(spark)
        hashed = webtext.decontaminate(docs, bench, use_hash=True)
        exact = webtext.decontaminate(docs, bench, use_hash=False)
        assert sorted(map(tuple, hashed.collect())) == sorted(
            map(tuple, exact.collect())
        )

    def test_case_insensitive_grams(self, spark):
        docs = spark.createDataFrame(
            [("d", " ".join(f"B{i}" for i in range(13)))],
            "doc_id string, text string",
        )
        bench = spark.createDataFrame(
            [("b", " ".join(f"b{i}" for i in range(13)))],
            "doc_id string, text string",
        )
        assert webtext.decontaminate(docs, bench).first()["contaminated"]

    def test_min_overlaps_threshold(self, spark):
        docs, bench = self._corpus(spark)
        got = {
            r["doc_id"]: r["contaminated"]
            for r in webtext.decontaminate(docs, bench, min_overlaps=2).collect()
        }
        assert got["c1"] is False and got["c4"] is True

    def test_corpus_side_broadcast_join_no_shuffle(self, spark):
        """The benchmark gram set must reach the corpus as a broadcast:
        the overlap join is a BroadcastHashJoin and the corpus side has no
        Exchange between scan and join (the 100 TB side never shuffles to
        find its matches)."""
        docs, bench = self._corpus(spark)
        plan = (
            webtext.decontaminate(docs, bench)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # corpus branch = between the overlap join and its BroadcastExchange
        # child (the corpus side prints first); it must contain no Exchange.
        # The bench branch below the BroadcastExchange may shuffle — it is
        # the tiny side by contract.
        corpus_branch = plan.split("BroadcastHashJoin")[-1].split(
            "BroadcastExchange"
        )[0]
        assert "Scan" in corpus_branch and "Exchange" not in corpus_branch


class TestRedactPii:
    def _run(self, spark, text):
        df = spark.createDataFrame([(text,)], "text string")
        r = webtext.redact_pii(F.col("text"))
        return df.select(*[c.alias(k) for k, c in r.items()]).first()

    def test_email(self, spark):
        got = self._run(spark, "mail me at First.Last+tag@sub.Example.CO.uk ok")
        assert got["text_redacted"] == "mail me at <EMAIL> ok"
        assert got["n_emails"] == 1 and got["n_ipv4"] == 0 and got["n_phones"] == 0

    def test_ipv4_not_phone(self, spark):
        """A dotted quad must become <IP>, not <PHONE> (order dependence)."""
        got = self._run(spark, "server 192.168.100.200 is up")
        assert got["text_redacted"] == "server <IP> is up"
        assert got["n_ipv4"] == 1 and got["n_phones"] == 0

    def test_out_of_range_quad_not_ip(self, spark):
        got = self._run(spark, "version 999.999.999.999 here")
        assert got["n_ipv4"] == 0

    def test_phone_forms(self, spark):
        got = self._run(spark, "call +1 (555) 010-4242 or 0470 123 456 now")
        assert got["n_phones"] == 2
        assert got["text_redacted"] == "call <PHONE> or <PHONE> now"

    def test_all_three_planted(self, spark):
        got = self._run(
            spark, "x a@b.io y 10.0.42.7 z +44 20 7946 0958 end"
        )
        assert (got["n_emails"], got["n_ipv4"], got["n_phones"]) == (1, 1, 1)
        assert got["text_redacted"] == "x <EMAIL> y <IP> z <PHONE> end"

    def test_clean_text_untouched(self, spark):
        text = "no personal data in this perfectly ordinary sentence"
        got = self._run(spark, text)
        assert got["text_redacted"] == text
        assert (got["n_emails"], got["n_ipv4"], got["n_phones"]) == (0, 0, 0)

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([("t",)], "text string")
        r = webtext.redact_pii(F.col("text"))
        plan = (
            df.select(*[c.alias(k) for k, c in r.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestFilterUrls:
    URLS = [
        (1, "https://ok-site.org/page"),
        (2, "https://sub.spam.example/x"),          # suffix of blocklist entry
        (3, "https://spam.example/y"),              # exact blocklist entry
        (4, "ftp://ok-site.org/z"),                 # bad scheme
        (5, "https://notspam.example.net/a"),       # 'spam.example' is NOT a suffix
        (6, "https://ok-site.org/buy?session=abc"), # pattern hit
        (7, "https://deep.a.b.spam.example/q"),     # deep subdomain, still a suffix
        (8, "ftp://spam.example/both"),             # scheme wins over host
    ]
    BLOCKED = ["spam.example"]
    PATTERNS = [r"\?session="]

    def _df(self, spark):
        return spark.createDataFrame(self.URLS, "id long, url string")

    def test_literal_reasons(self, spark):
        out = webtext.filter_urls(
            self._df(spark), "url", blocked_hosts=self.BLOCKED,
            blocked_url_patterns=self.PATTERNS, reason_col="why",
        )
        got = {r["id"]: r["why"] for r in out.collect()}
        assert got == {1: None, 2: "host", 3: "host", 4: "scheme",
                       5: None, 6: "pattern", 7: "host", 8: "scheme"}

    def test_literal_filter_drops(self, spark):
        out = webtext.filter_urls(
            self._df(spark), "url", blocked_hosts=self.BLOCKED,
            blocked_url_patterns=self.PATTERNS,
        )
        assert sorted(r["id"] for r in out.collect()) == [1, 5]
        assert out.columns == ["id", "url"]

    def test_dataframe_blocklist_matches_literal(self, spark):
        bl = spark.createDataFrame([(h,) for h in self.BLOCKED], "host string")
        lit = webtext.filter_urls(
            self._df(spark), "url", blocked_hosts=self.BLOCKED,
            blocked_url_patterns=self.PATTERNS, reason_col="why",
        )
        dfp = webtext.filter_urls(
            self._df(spark), "url", blocked_host_df=bl,
            blocked_url_patterns=self.PATTERNS, reason_col="why",
        )
        assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, dfp.collect()))

    def test_dataframe_blocklist_no_corpus_exchange(self, spark):
        bl = spark.createDataFrame([("spam.example",)], "host string")
        out = webtext.filter_urls(self._df(spark), "url", blocked_host_df=bl)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every host join must broadcast; the corpus side never shuffles —
        # the only exchanges allowed are the blocklist side's dedup
        # (hash keys named _bhN), which rides the broadcast build
        import re as _re
        assert "BroadcastHashJoin" in plan
        for m in _re.finditer(r"Exchange hashpartitioning\((\w+)", plan):
            assert m.group(1).startswith("_bh"), plan

    def test_scheme_allowlist_none_disables(self, spark):
        out = webtext.filter_urls(
            self._df(spark), "url", blocked_hosts=self.BLOCKED,
            allowed_schemes=None, reason_col="why",
        )
        got = {r["id"]: r["why"] for r in out.collect()}
        assert got[4] is None       # ftp kept when scheme check is off
        assert got[8] == "host"     # host verdict surfaces instead


class TestDedupLinesWithinDoc:
    """In-document repeated-line removal (RefinedWeb/SlimPajama-style
    extraction hygiene; webtext.dedup_lines_within_doc)."""

    def _out(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = webtext.dedup_lines_within_doc(F.col("text"))
        return df.select("doc_id", *[v.alias(k) for k, v in d.items()])

    def test_keep_first_drop_later_copies(self, spark):
        out = {
            r["doc_id"]: r.asDict()
            for r in self._out(spark, [
                (1, "Accept cookies\nreal one\nAccept cookies\n\n"
                    "real two\n\nACCEPT  COOKIES!"),
            ]).collect()
        }
        # both the exact later copy AND the normalized-equal variant drop;
        # blank separator lines are always kept
        assert out[1]["text_deduped"] == (
            "Accept cookies\nreal one\n\nreal two\n"
        )
        assert out[1]["n_lines"] == 7
        assert out[1]["n_removed"] == 2
        assert out[1]["chars_removed"] == len("Accept cookies") + len(
            "ACCEPT  COOKIES!"
        )

    def test_empty_norm_lines_always_kept(self, spark):
        out = self._out(spark, [(4, "123\n123\n!!\n!!")]).collect()[0]
        assert out["text_deduped"] == "123\n123\n!!\n!!"
        assert out["n_removed"] == 0

    def test_single_and_empty_docs(self, spark):
        rows = self._out(spark, [(2, "only line"), (3, "")]).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[2]["text_deduped"] == "only line"
        assert by_id[3]["text_deduped"] == ""
        assert by_id[3]["n_lines"] == 1  # split('') -> ['']

    def test_pure_projection_no_shuffle(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb\na")], "doc_id long, text string"
        )
        d = webtext.dedup_lines_within_doc(F.col("text"))
        plan = (
            df.select("doc_id", *[v.alias(k) for k, v in d.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_no_per_element_rescan_in_plan(self, spark):
        """Regression: first-occurrence detection must be the single
        aggregate() fold, never an array_position/filter probe that
        captures the key array inside a per-element lambda — Spark
        re-evaluates captured outer expressions per element (no
        hoisting out of HOF lambda scopes), making the pass
        O(n_lines^2) full-doc re-splits (minutes vs seconds per rep on
        the 2M-doc control corpus)."""
        df = spark.createDataFrame(
            [(1, "a\nb\na")], "doc_id long, text string"
        )
        d = webtext.dedup_lines_within_doc(F.col("text"))
        plan = (
            df.select("doc_id", *[v.alias(k) for k, v in d.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "array_position" not in plan
        # the doc is split at most once per output column, not once per
        # line element (4 output columns, each plan-printed expression
        # may inline the split into zip_with's two arguments)
        assert plan.count("split(") <= 3 * 4


class TestDedupUrlKeepLatest:
    def test_collapses_canonical_variants_keeps_newest(self, spark):
        import datetime as dt

        rows = [
            ("HTTPS://WWW.A.com:443/x", dt.datetime(2024, 1, 1), "v1"),
            ("https://a.com/x", dt.datetime(2024, 3, 1), "v3"),
            ("https://a.com/x/", dt.datetime(2024, 2, 1), "v2"),
            ("http://b.com/y", dt.datetime(2024, 1, 1), "only"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        out = webtext.dedup_url_keep_latest(df).orderBy("url_key").collect()
        assert [(r["url_key"], r["n_crawls"], r["text"]) for r in out] == [
            ("http://b.com/y", 1, "only"),
            ("https://a.com/x", 3, "v3"),
        ]
        # survivor carries its RAW row, not the canonical key
        assert out[1]["url"] == "https://a.com/x"
        assert out[1]["warc_ts"] == dt.datetime(2024, 3, 1)

    def test_ts_tie_breaks_lexicographically_null_ts_loses(self, spark):
        import datetime as dt

        ts = dt.datetime(2024, 6, 1)
        rows = [
            ("https://a.com/x", ts, "bbb"),
            ("https://a.com/x", ts, "aaa"),
            ("https://a.com/x", None, "zzz"),  # dated crawls always win
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        out = webtext.dedup_url_keep_latest(df).collect()
        assert len(out) == 1
        assert out[0]["n_crawls"] == 3
        assert out[0]["text"] == "bbb"  # max over the tied-ts field chain

    def test_partitioning_invariance(self, spark):
        import datetime as dt

        rows = [
            (f"https://s{i % 5}.com/p{i % 17}",
             dt.datetime(2024, 1, 1 + i % 28), f"t{i}")
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        a = sorted(map(tuple, webtext.dedup_url_keep_latest(
            df.repartition(1)).collect()))
        b = sorted(map(tuple, webtext.dedup_url_keep_latest(
            df.repartition(7)).collect()))
        assert a == b

    def test_plan_is_one_hash_aggregate_no_window(self, spark):
        """Scale contract: the pass must be groupBy+max(struct) (map-side
        combinable partial aggregation), never a row_number window that
        shuffles and sorts every crawl row."""
        import datetime as dt

        df = spark.createDataFrame(
            [("https://a.com/x", dt.datetime(2024, 1, 1), "t")],
            "url string, warc_ts timestamp, text string",
        )
        plan = (
            webtext.dedup_url_keep_latest(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        # partial + final aggregate pair, one exchange between them
        assert plan.count("Exchange") == 1


def test_line_dedup_null_text_doc_kept(spark):
    """posexplode emits zero rows for null text — the one-row-per-doc
    contract still must hold (session-8 review fix): null-text docs come
    back with text_deduped NULL and zero counts."""
    df = spark.createDataFrame(
        [("d1", "x\ny"), ("dn", None)], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in webtext.line_dedup(df, "doc_id", "text").collect()
    }
    assert set(out) == {"d1", "dn"}
    assert out["dn"]["text_deduped"] is None
    assert out["dn"]["n_lines"] == 0
    assert out["dn"]["n_removed"] == 0
    assert out["dn"]["chars_removed"] == 0


def test_line_dedup_null_id_doc_kept(spark):
    """The id join-back is NULL-SAFE (r5 ADVICE fix): a null-id doc with
    non-null text keeps its real deduped text and counts instead of the
    silently-dropped NULL/zero row a plain equi-join produced."""
    df = spark.createDataFrame(
        [("d1", "x\ny"), (None, "a\na\nb")], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in webtext.line_dedup(df, "doc_id", "text").collect()
    }
    assert set(out) == {"d1", None}
    # 'a' repeats corpus-wide (min_count=2) -> both copies drop
    assert out[None]["text_deduped"] == "b"
    assert out[None]["n_lines"] == 3
    assert out[None]["n_removed"] == 2


def test_url_host_trailing_root_dot_stripped(spark):
    """'http://example.com./x' is the same origin as example.com (DNS
    root-dot form); the blocklist must not be evadable with it
    (session-8 review fix)."""
    df = spark.createDataFrame([("http://EXAMPLE.com.:8080/x",)], "url string")
    assert df.select(
        webtext.url_host(F.col("url")).alias("h")
    ).first()["h"] == "example.com"
    reason = df.select(
        webtext.url_block_reason(
            F.col("url"), blocked_hosts=["example.com"],
            allowed_schemes=("http", "https"),
        ).alias("r")
    ).first()["r"]
    assert reason == "host"


def test_engine_config_env_read_at_build_time(monkeypatch):
    """SPARK_GRAFT_* env vars must take effect when EngineConfig() is
    BUILT, not when the module was first imported (session-8 review fix:
    default_factory instead of import-time defaults)."""
    from recordlinkage_spark.config import EngineConfig

    monkeypatch.setenv("SPARK_GRAFT_STAGE_FORMAT", "iceberg")
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "7")
    cfg = EngineConfig()
    assert cfg.stage_format == "iceberg"
    assert cfg.shuffle_partitions == 7
    monkeypatch.delenv("SPARK_GRAFT_STAGE_FORMAT")
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE")
    assert EngineConfig().stage_format == "parquet"


def test_dedup_url_keep_latest_null_urls_pass_through(spark):
    """Null-url rows are unrelated failure records, not recrawls of one
    page — groupBy's single null key must not collapse them (session-8
    review fix)."""
    df = spark.createDataFrame(
        [
            ("https://a.example.com/x", 1, "a1"),
            ("https://a.example.com/x", 2, "a2"),
            (None, 1, "n1"),
            (None, 2, "n2"),
        ],
        "url string, ts int, text string",
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("ts") * 3600)).drop("ts")
    out = webtext.dedup_url_keep_latest(df, url_col="url", ts_col="warc_ts")
    rows = out.collect()
    assert len(rows) == 3  # one survivor for the url, BOTH null-url rows
    null_rows = [r for r in rows if r["url_key"] is None]
    assert {r["text"] for r in null_rows} == {"n1", "n2"}
    assert all(r["n_crawls"] == 1 for r in null_rows)
    keyed = [r for r in rows if r["url_key"] is not None]
    assert keyed[0]["text"] == "a2" and keyed[0]["n_crawls"] == 2


def test_dedup_lines_within_doc_null_text_zero_counts(spark):
    """Null text: text_deduped NULL with ZERO counts — the documented
    line_dedup output contract (session-8 review fix: n_lines/n_removed
    previously came back NULL)."""
    d = webtext.dedup_lines_within_doc(F.col("text"))
    row = (
        spark.createDataFrame([(None,)], "text string")
        .select(*[v.alias(k) for k, v in d.items()])
        .collect()[0]
    )
    assert row["text_deduped"] is None
    assert row["n_lines"] == 0
    assert row["n_removed"] == 0
    assert row["chars_removed"] == 0
