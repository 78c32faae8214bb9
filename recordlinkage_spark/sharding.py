"""Deterministic sharding, sampling, and leakage-safe train/eval splits.

Training-data pipelines need three assignment primitives downstream of
dedup, and all three must be *deterministic functions of a key* — never
RNG state — so that re-running any slice of a 100 TB corpus reproduces
byte-identical assignments and a grown corpus never reshuffles old rows:

- ``shard_assign``: route each row to one of N output shards (training
  shards, writer tasks, curriculum buckets).
- ``deterministic_split``: train/validation/test assignment by weight.
- ``deterministic_sample``: keep a fraction of rows, optionally a
  different fraction per group (e.g. per-language token budgets). Built
  on a hash-threshold rule, so samples are NESTED: the 10% sample is a
  strict subset of the 20% sample under the same salt — growing or
  shrinking a budget never resamples what was already kept.

``cluster_aware_split`` composes the split with a dedup clustering
(e.g. ``network.ConnectedComponents`` output): every member of a
near-duplicate cluster hashes on its CLUSTER key, so no near-dup pair
can straddle train and eval. Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better") measure exactly this leakage mode —
eval prompts whose near-duplicates sit in train — as the largest source
of inflated benchmark numbers; a row-keyed split cannot prevent it, a
cluster-keyed split prevents it by construction.

Scale design (100 TB):

- Every assignment is a pure JVM column expression (md5/xxhash64 +
  pmod + comparison chain): zero Python, zero shuffle — shard/split/
  sample run inline with the Iceberg scan as a projection/filter, and
  writing shards is ``df.write.partitionBy(shard_col)`` with no extra
  exchange beyond the write's own.
- ``cluster_aware_split`` adds exactly one join against the cluster
  table. After dedup the cluster table holds only clustered doc ids
  (singletons are absent and coalesce to their own id), which is
  orders of magnitude smaller than the corpus — AQE broadcasts it;
  the corpus side never shuffles.
- Two hash flavors, same bucket semantics: ``xxhash64`` (default) is
  the cheap JVM path for production; ``md5`` is bit-portable across
  engines (Spark ``conv(substr(md5(k),1,15),16,10)`` equals DuckDB
  ``('0x'||substr(md5(k),1,15))::BIGINT``), which is what lets the
  driver's DuckDB oracle verify assignments hash-exactly.

The reference has no sharding/split surface (its pandas outputs are
small enough to `.sample()` in memory; cf. reference
recordlinkage/datasets/febrl.py:30-80 returning full frames) — these
operators exist because the 10^12-doc target of the north rule makes
assignment-by-hash the only reproducible option.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bucket denominator for split/sample thresholds: 1e6 buckets keeps
# threshold granularity at 1e-6 while staying far below the 60-bit hash
# space (bias from pmod truncation < 2^20/2^60 ~ 1e-12 per bucket).
BUCKETS = 1_000_000


def portable_hash60(key: Column, salt: str = "") -> Column:
    """60-bit hash of ``key`` (cast to string) that computes identically
    in Spark and DuckDB/ANSI SQL: the first 15 hex digits of
    ``md5(key || salt)`` parsed base-16. Used by the oracle-verified
    paths; prefer ``xxhash64`` where cross-engine parity isn't needed."""
    s = F.concat(key.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _bucket(key: Column, salt: str, hash_fn: str) -> Column:
    """Uniform bucket in [0, BUCKETS) from the chosen hash flavor."""
    if hash_fn == "md5":
        return F.pmod(portable_hash60(key, salt), F.lit(BUCKETS))
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(key.cast("string"), F.lit(salt)), F.lit(BUCKETS)
        )
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_col: str = "shard",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``shard_col`` = deterministic shard id in [0, n_shards) keyed
    on ``key_col``. Same key -> same shard on every run, every cluster
    size, every partitioning of the input."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if hash_fn == "md5":
        h = portable_hash60(F.col(key_col), salt)
    elif hash_fn == "xxhash64":
        h = F.xxhash64(F.col(key_col).cast("string"), F.lit(salt))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return df.withColumn(
        shard_col, F.pmod(h, F.lit(n_shards)).cast("int")
    )


def _split_expr(
    key: Column, weights: dict[str, float], salt: str, hash_fn: str
) -> Column:
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bkt = _bucket(key, salt, hash_fn)
    # cumulative integer thresholds over the bucket space; the last split
    # takes everything remaining so rounding never drops a bucket
    names = list(weights)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bkt < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``split_col`` with a weighted deterministic assignment keyed on
    ``key_col``. ``weights`` is ``{name: weight}`` in assignment order
    (weights are normalized; e.g. ``{"train": 8, "val": 1, "test": 1}``).
    Rows with equal keys always land in the same split."""
    return df.withColumn(
        split_col, _split_expr(F.col(key_col), weights, salt, hash_fn)
    )


def cluster_aware_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    weights: dict[str, float],
    cluster_col: str = "cluster_id",
    split_col: str = "split",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Train/eval split that can never leak a near-duplicate across the
    boundary: each row hashes on its dedup CLUSTER key (its own id when
    unclustered), so whole clusters move together.

    ``clusters`` is ``(id_col, cluster_col)`` — the shape
    ``network.ConnectedComponents().compute()`` returns over the
    candidate-pair graph. Docs absent from it (singletons — the vast
    majority after dedup) coalesce to their own id, with zero shuffle on
    the corpus side when the cluster table broadcasts.

    Returns ``docs`` plus ``split_key`` (the key actually hashed) and
    ``split_col``.
    """
    cl = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("_cl")
    )
    out = (
        docs.join(cl, id_col, "left")
        .withColumn("split_key", F.coalesce(F.col("_cl"), F.col(id_col)))
        .drop("_cl")
    )
    return out.withColumn(
        split_col, _split_expr(F.col("split_key"), weights, salt, hash_fn)
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 256,
    shard_col: str = "shard",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining: within each
    shard, docs are laid out end-to-end in a deterministic order and the
    stream is cut every ``budget`` tokens. Each doc gets

      - ``shard``     : its deterministic shard (``shard_assign`` rule),
      - ``pack_id``   : the chunk its FIRST token falls in (per shard),
      - ``pack_pos``  : its token offset inside that chunk,
      - ``spans_boundary``: true when the doc crosses a chunk cut (the
        trainer splits it across consecutive packs — the standard
        GPT-style packing semantics, where chunk cuts ignore doc
        boundaries).

    Everything is a pure function of (key, salt, budget, n_shards):
    re-runs, re-partitions, and cluster-size changes reproduce identical
    layout, and the within-shard order is by (hash-bucket, key) so the
    stream order itself is a deterministic corpus shuffle — no RNG.

    Scale design: ONE exchange (the per-shard window); shards are
    hash-uniform so the window never sees skew, and ``n_shards`` bounds
    per-task state (pick shards so a shard's docs fit one task:
    ~10^12 docs / 10^5 shards = 10^7 rows/task). The running offset is a
    window ``sum() rows between unbounded preceding and -1`` — map-side
    partial aggregation applies, no driver participation.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    out = shard_assign(df, key_col, n_shards, shard_col=shard_col,
                       salt=salt, hash_fn=hash_fn)
    order_bucket = _bucket(F.col(key_col), salt + "#order", hash_fn)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_bucket, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return (
        out.withColumn("_cum_prev", cum_prev)
        .withColumn("pack_id", (F.col("_cum_prev") / budget).cast("long"))
        .withColumn("pack_pos", (F.col("_cum_prev") % budget).cast("long"))
        .withColumn(
            "spans_boundary",
            (F.col("pack_pos") + F.col(token_col).cast("long")) > budget,
        )
        .drop("_cum_prev")
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    by: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep rows whose key-bucket falls below ``fraction * BUCKETS``.

    Deterministic (same key+salt -> same verdict forever) and NESTED:
    ``deterministic_sample(df, k, 0.1, salt=s)`` is a strict subset of
    ``deterministic_sample(df, k, 0.2, salt=s)`` — raising a data budget
    only ADDS rows, so downstream caches and checkpoints stay valid.

    Per-group rates: pass ``by`` (a column of group labels) and
    ``fractions`` ``{label: fraction}``; ``fraction`` becomes the default
    for unlisted labels (0.0 when omitted — unlisted groups drop). The
    rate lookup is a literal map expression: no join, no shuffle.
    """
    if fraction is None and not fractions:
        raise ValueError("pass fraction=, or by=/fractions=")
    if fractions and by is None:
        raise ValueError("fractions= requires by=")
    bkt = _bucket(F.col(key_col), salt, hash_fn)
    default = float(fraction) if fraction is not None else 0.0
    if fractions:
        mapping = F.create_map(
            *[F.lit(x) for kv in fractions.items() for x in kv]
        )
        rate = F.coalesce(
            mapping[F.col(by).cast("string")], F.lit(default)
        )
    else:
        rate = F.lit(default)
    return df.filter(bkt < (rate * BUCKETS).cast("long"))


def select_by_budget(
    df: DataFrame,
    key_col: str,
    score_col: str,
    token_col: str,
    budget: int,
    mode: str = "threshold",
    n_bins: int = 4096,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Quality-ranked token-budget selection: keep the highest-``score_col``
    docs until ``budget`` tokens are selected — the curation step modern
    pretraining recipes run after dedup (rank by a quality score, take
    the best slice that fits the compute budget; cf. FineWeb / DCLM
    ablation protocol).

    Two modes, same ranking rule (score desc, ``key_col`` asc tiebreak):

    - ``mode="exact"``: a doc is kept iff the running token total of all
      strictly-better-ranked docs is still below ``budget`` (so the one
      doc that straddles the boundary is kept, mirroring
      ``pack_sequences``' chunk semantics). Implemented as a single
      unpartitioned window cumsum — a total order, so ONE task sees
      every row: correct at test/oracle scale, NOT the 100 TB path.

    - ``mode="threshold"`` (default, the scale path): two tiny
      aggregations and a shuffle-free filter, no global sort —
      (1) min/max of score, (2) a fixed-width ``n_bins`` histogram of
      token mass over score. The driver walks the n_bins-row histogram
      top-down to find the boundary bin, keeps every doc scoring above
      it outright, and inside the boundary bin keeps a deterministic
      hash-fraction of docs (``deterministic_sample`` rule on
      ``key_col``) sized to the remaining budget. Selected token mass
      lands within ~the boundary bin's mass of ``budget`` (expected
      error ~ total_tokens / n_bins); raise ``n_bins`` to tighten.
      Deterministic given (data, salt, n_bins); docs above the boundary
      bin are stable under budget growth (a larger budget only moves
      the boundary DOWN, never evicts a kept doc).

    Returns the selected rows (original columns). Rows with a null or
    NaN ``score_col`` are never selected — they have no defined rank
    (and an unexcluded NaN would poison the threshold histogram's
    min/max sizing).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if mode not in ("exact", "threshold"):
        raise ValueError(f"mode must be 'exact' or 'threshold', got {mode!r}")
    score = F.col(score_col).cast("double")
    tok = F.col(token_col).cast("long")
    # A null/NaN score is unrankable, so those rows are excluded from
    # selection in BOTH modes (and from the budget mass). Without this,
    # one NaN poisons the threshold mode wholesale: max() returns NaN
    # (NaN sorts above every double), hi/width become NaN, every doc
    # collapses into a single histogram bin, and the "quality-ranked"
    # selection silently degrades to a uniform hash sample; in exact
    # mode a NaN doc would rank FIRST and consume budget.
    df = df.filter(score.isNotNull() & ~F.isnan(score))

    if mode == "exact":
        from pyspark.sql import Window

        w = (
            Window.orderBy(F.desc(score_col), F.asc(key_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum_prev = F.coalesce(F.sum(tok).over(w), F.lit(0).cast("long"))
        return (
            df.withColumn("_cum_prev", cum_prev)
            .filter(F.col("_cum_prev") < budget)
            .drop("_cum_prev")
        )

    lohi = df.agg(
        F.min(score).alias("lo"), F.max(score).alias("hi"),
        F.sum(tok).alias("total"),
    ).collect()[0]
    if lohi["lo"] is None or not lohi["total"]:
        return df.filter(F.lit(False))
    lo, hi, total = float(lohi["lo"]), float(lohi["hi"]), int(lohi["total"])
    if total <= budget:
        return df
    width = (hi - lo) / n_bins or 1.0
    # bin 0 holds the BEST scores so the driver walk reads top-down;
    # scores at exactly `lo` clamp into the last bin
    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.floor((F.lit(hi) - score) / F.lit(width)).cast("int"),
    )
    hist = {
        int(r["b"]): int(r["m"])
        for r in df.groupBy(bin_expr.alias("b"))
        .agg(F.sum(tok).alias("m"))
        .collect()
    }
    cum = 0
    boundary = n_bins - 1
    for b in range(n_bins):
        mass = hist.get(b, 0)
        if cum + mass >= budget:
            boundary = b
            break
        cum += mass
    bound_mass = hist.get(boundary, 0)
    keep_frac = min(1.0, (budget - cum) / bound_mass) if bound_mass else 0.0
    bkt = _bucket(F.col(key_col), salt, hash_fn)
    return df.filter(
        (bin_expr < boundary)
        | ((bin_expr == boundary) & (bkt < F.lit(int(keep_frac * BUCKETS))))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    order_col: str | None = None,
    descending: bool = True,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the domain-balancing step web
    pipelines run so no single host/source dominates the corpus (C4 and
    Gopher both cap per-domain contribution after dedup).

    Which rows survive is deterministic: rank within the group by
    ``order_col`` (best-first when ``descending``; e.g. a quality score)
    with ``key_col`` as the tiebreak, or — when ``order_col`` is None —
    by the (hash-bucket, key) order, i.e. an unbiased but reproducible
    per-group subsample, the same RNG-free rule as
    ``deterministic_sample``.

    Scale design: ONE exchange (hash partition on ``group_col``) and a
    per-group ``row_number`` — map-side nothing to combine, but the
    window never materializes a group, it streams sorted runs. A group
    bigger than a task's spill budget still sorts (external sort);
    at 10^12 docs a pathological mega-host is exactly what the cap is
    for, and the post-filter output is <= cap rows per group by
    construction. No Python, no driver participation.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    if order_col is not None:
        first = F.desc(order_col) if descending else F.asc(order_col)
        order = [first, F.asc(key_col)]
    else:
        order = [F.asc(_bucket(F.col(key_col), salt, hash_fn)),
                 F.asc(key_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mix_corpora(
    sources: dict[str, DataFrame],
    key_col: str,
    token_col: str,
    weights: dict[str, float],
    total_budget: int,
    source_col: str = "mix_source",
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Weighted multi-source corpus mixing: draw from each source so the
    mixture hits ``total_budget`` tokens at the given proportions — the
    step that turns per-source curated pools into one pretraining mix
    (web : code : books : ... at pinned ratios, cf. the GPT-3 / Pile /
    LLaMA data recipes).

    Each source's target is ``total_budget * weight / sum(weights)``;
    the source is kept whole when it holds fewer tokens than its target
    (the deficit is NOT redistributed — callers see the shortfall in the
    returned frame's per-source totals and decide the policy), otherwise
    ``deterministic_sample``-rule thinned by the token-mass ratio.
    Sampling is hash-keyed on ``key_col`` with a per-source salt, so
    mixes are deterministic, partition-independent, and NESTED under
    budget growth: raising ``total_budget`` only adds rows to every
    source's slice. All sources must share the schema (columns are
    aligned by name); the output adds ``source_col``.

    Scale design: one tiny ``sum(token_col)`` aggregation per source to
    size the rates (driver sees one number each), then a shuffle-free
    hash-threshold filter per source and a ``unionByName`` — the mix
    never shuffles corpus rows. Expected token error per thinned source
    is ~1/sqrt(n_kept) relative (hash-sampling variance), not exact-cut;
    use ``select_by_budget`` per source first when exact cuts matter.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    missing = set(sources) - set(weights)
    if missing:
        raise ValueError(f"no weight for sources: {sorted(missing)}")
    wsum = float(sum(weights[name] for name in sources))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")

    out: DataFrame | None = None
    for name, df in sources.items():
        target = total_budget * weights[name] / wsum
        total_row = df.agg(F.sum(F.col(token_col).cast("long")).alias("t")).collect()[0]
        total = int(total_row["t"] or 0)
        rate = 1.0 if total <= target else target / total
        part = deterministic_sample(
            df, key_col, fraction=rate, salt=f"{salt}|{name}", hash_fn=hash_fn
        ).withColumn(source_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("sources must be a non-empty {name: DataFrame} dict")
    return out
